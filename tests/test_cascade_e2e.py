"""Unbounded / cascaded path end-to-end: COLMAP provider -> bound>1 training
with cascade occupancy -> inner + outer cascade mesh export -> stage-1 over
the multi-cascade mesh set.

The reference's headline unbounded configs are LLFF at bound 4 and
Mip-NeRF-360 at bound 16 with scene contraction (scripts/runall_360.sh;
outer-cascade export at renderer.py:546-672; colmap_provider.py pose +
near/far pipeline).  Until round 3 every e2e test ran bound=1/cascades=1;
this file composes the pieces the way those recipes do, at toy scale.
"""

import os

import numpy as np
import pytest

from nerf2mesh_tpu.main import main


@pytest.fixture(scope="module")
def colmap_scene(tmp_path_factory):
    from nerf2mesh_tpu.data.synthetic import generate_colmap_dataset
    root = str(tmp_path_factory.mktemp("cascade_scene"))
    # env sphere gives every ray real background geometry outside cascade 0
    generate_colmap_dataset(root, H=48, W=48, n_images=12, n_points=400)
    return root


@pytest.fixture(scope="module")
def ws(tmp_path_factory):
    return str(tmp_path_factory.mktemp("cascade_ws"))


@pytest.mark.slow
def test_cascade_stage0_e2e(colmap_scene, ws):
    """Full main() stage-0 recipe at bound 4 (cascades=3) through the colmap
    provider: train, eval, and export inner + at least one outer cascade
    mesh (renderer.py:546-672)."""
    main([colmap_scene, "--workspace", ws, "--data_format", "colmap",
          "--bound", "4", "--scale", "1", "--ckpt", "scratch",
          "--num_rays", "256", "--num_points", "16384",
          "--samples_per_ray", "32", "--max_steps", "64",
          "--grid_size", "32", "--diffuse_step", "30",
          "--random_image_batch", "--iters", "200",
          "--n_eval", "1", "--n_ckpt", "1", "--test_no_video",
          "--mcubes_reso", "64", "--env_reso", "32",
          "--decimate_target", "5000", "--clean_min_f", "0"])

    mdir = os.path.join(ws, "mesh_stage0")
    from nerf2mesh_tpu.meshing.io import read_ply
    v0, f0 = read_ply(os.path.join(mdir, "mesh_0.ply"))
    assert len(f0) > 10
    # inner mesh lives in the unit cascade
    assert np.abs(v0).max() <= 1.0 + 1e-5
    outer = [p for p in os.listdir(mdir)
             if p.startswith("mesh_") and p != "mesh_0.ply"]
    assert outer, "no outer-cascade mesh exported at bound 4"
    vs = [read_ply(os.path.join(mdir, p)) for p in sorted(outer)]
    # outer cascade geometry extends beyond the unit box and stays in-bound
    vmax = max(np.abs(v).max() for v, _ in vs)
    assert 1.0 < vmax <= 4.0 + 1e-4
    assert all(len(f) > 0 for _, f in vs)


@pytest.mark.slow
def test_cascade_stage1_smoke(colmap_scene, ws):
    """Stage-1 over the cascade mesh set: load_stage1_mesh concatenates all
    cascades (renderer.py:130-153), a few rasterized training steps run, and
    the web export writes per-cascade OBJs."""
    mdir = os.path.join(ws, "mesh_stage0")
    if not os.path.exists(os.path.join(mdir, "mesh_0.ply")):
        pytest.skip("stage-0 export missing (stage-0 test failed)")
    main([colmap_scene, "--workspace", ws, "--data_format", "colmap",
          "--stage", "1", "--bound", "4", "--scale", "1",
          "--num_rays", "256", "--samples_per_ray", "32",
          "--grid_size", "32", "--iters", "8", "--lr_vert", "1e-4",
          "--n_eval", "1", "--n_ckpt", "1", "--test_no_video",
          "--texture_size", "128", "--s1_crop", "48"])
    out = os.path.join(ws, "mesh_stage1")
    objs = [p for p in os.listdir(out) if p.endswith(".obj")]
    assert objs, "stage-1 export wrote no OBJ"
    assert os.path.exists(os.path.join(out, "mlp.json"))


@pytest.mark.slow
def test_contracted_360_smoke(colmap_scene, tmp_path_factory):
    """Mip-NeRF-360-style recipe: bound 16 + scene contraction through the
    colmap provider (reference main.py contraction flags; runall_360.sh).
    Asserts training + render are finite and the contracted grid covers
    background samples (grid_bound=2, cascades=2)."""
    ws = str(tmp_path_factory.mktemp("c360_ws"))
    from nerf2mesh_tpu.config import parse_args
    from nerf2mesh_tpu.data.colmap import load_colmap_dataset
    from nerf2mesh_tpu.utils.trainer import Trainer

    cfg = parse_args([colmap_scene, "--workspace", ws, "--data_format",
                      "colmap", "--bound", "16", "--contract",
                      "--ckpt", "scratch",
                      "--num_rays", "256", "--num_points", "16384",
                      "--samples_per_ray", "32", "--max_steps", "64",
                      "--grid_size", "32", "--diffuse_step", "20",
                      "--random_image_batch", "--iters", "60"])
    assert cfg.cascades == 2 and cfg.grid_bound == 2.0
    ds = load_colmap_dataset(cfg, "train")
    tr = Trainer(cfg)
    if hasattr(ds, "pts_aabb"):
        tr.update_aabb(ds.pts_aabb)
    m = tr.train(ds)
    assert np.isfinite(float(m["loss"]))
    out = tr.render_image(ds.poses[0], ds.intrinsics_for(0), ds.H, ds.W)
    assert np.isfinite(out["image"]).all()
    # the env sphere sits far outside the unit box: background must
    # accumulate weight through the contracted outer cascade
    assert float(out["weights_sum"].mean()) > 0.1
