"""SDF (NeuS-style) mode end-to-end: sphere pretrain -> short training ->
mesh export -> chamfer against the analytic scene SDF.

The reference enables this path with --sdf (main.py:138-153): the density
field becomes a signed distance, compositing switches to NeuS alpha, and
--ckpt scratch triggers the double-sphere pretrain (utils.py:592-594,
network.py:111-131).  This test asserts the full chain converges toward the
true surface on the tiny procedural sphere scene.
"""

import os

import numpy as np
import pytest

from nerf2mesh_tpu.config import parse_args


@pytest.fixture(scope="module")
def scene_root(tmp_path_factory):
    from nerf2mesh_tpu.data.synthetic import generate_synthetic_dataset
    root = str(tmp_path_factory.mktemp("sdf_scene"))
    generate_synthetic_dataset(root, H=48, W=48, n_train=10, n_val=2,
                               n_test=2)
    return root


@pytest.mark.slow
def test_sdf_trains_and_meshes_near_surface(scene_root, tmp_path_factory):
    from nerf2mesh_tpu.data.provider import load_nerf_dataset
    from nerf2mesh_tpu.data.synthetic import SphereScene
    from nerf2mesh_tpu.meshing.io import read_ply
    from nerf2mesh_tpu.utils.trainer import Trainer

    ws = str(tmp_path_factory.mktemp("sdf_ws"))
    cfg = parse_args([
        scene_root, "--workspace", ws, "--sdf", "--ckpt", "scratch",
        "--bound", "1", "--scale", "0.8", "--dt_gamma", "0",
        "--num_rays", "512", "--num_points", "16384",
        "--samples_per_ray", "32", "--max_steps", "64", "--grid_size", "16",
        "--diffuse_step", "30", "--random_image_batch",
        "--iters", "250", "--n_eval", "1", "--n_ckpt", "1"])
    assert cfg.sdf and cfg.density_thresh == 0.001  # --sdf macro applied

    ds = load_nerf_dataset(cfg, "train")
    t = Trainer(cfg)
    t.sdf_pretrain(iters=200, batch_size=4096)

    # after pretrain the raw field must be a signed distance shaped like the
    # init spheres: negative inside the scene center (inside the r1=0.5
    # sphere), positive between the two init spheres (network.py:111-131)
    import jax.numpy as jnp
    from nerf2mesh_tpu.models.network import density
    s_in = density(t.state.params, jnp.zeros((1, 3)), t.net_spec)
    s_mid = density(t.state.params,
                    jnp.asarray([[0.9, 0.0, 0.0]]), t.net_spec)
    assert float(s_in[0]) < 0.0 < float(s_mid[0])

    m = t.train(ds)
    assert np.isfinite(float(m["loss"]))
    assert float(m["psnr"]) > 15.0

    t.save_mesh(resolution=48, decimate_target=5000)
    v, f = read_ply(os.path.join(ws, "mesh_stage0", "mesh_0.ply"))
    assert len(v) > 10 and len(f) > 10

    # chamfer-style probe: mesh vertices vs the analytic scene SDF (the
    # dataset was generated from SphereScene; poses use cfg.scale=0.8)
    scene = SphereScene()
    d = np.abs(scene.sdf(np.asarray(v, np.float32) / cfg.scale) * cfg.scale)
    frac_near = float((d < 0.06).mean())
    assert frac_near >= 0.7, f"only {frac_near:.2f} of verts near surface " \
                             f"(mean |sdf| {d.mean():.4f})"
    assert float(d.mean()) < 0.05
