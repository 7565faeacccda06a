"""End-to-end smoke tests (SURVEY.md §4c): tiny synthetic scene, both stages,
mesh export.  Sized to run in a couple of minutes on the CPU test mesh."""

import os

import numpy as np
import pytest

from nerf2mesh_tpu.config import parse_args


@pytest.fixture(scope="module")
def scene_root(tmp_path_factory):
    from nerf2mesh_tpu.data.synthetic import generate_synthetic_dataset
    root = str(tmp_path_factory.mktemp("e2e_scene"))
    # ssaa=2 GT: blender nerf-synthetic GT is antialiased (path traced);
    # 1-spp GT has binary rim pixels no AA renderer can match — at 48px the
    # rim is ~8% of pixels and caps stage-1 eval near 19 dB regardless of
    # mesh quality (see generate_synthetic_dataset docstring)
    generate_synthetic_dataset(root, H=48, W=48, n_train=10, n_val=2,
                               n_test=2, ssaa=2)
    return root


@pytest.fixture(scope="module")
def workspace(tmp_path_factory):
    return str(tmp_path_factory.mktemp("e2e_ws"))


def _cfg(scene_root, workspace, extra=()):
    return parse_args([
        scene_root, "--workspace", workspace, "--bound", "1", "--scale", "0.8",
        "--dt_gamma", "0", "--num_rays", "512", "--num_points", "16384",
        "--samples_per_ray", "32", "--max_steps", "64", "--grid_size", "16",
        "--diffuse_step", "30", "--random_image_batch",
        "--n_eval", "1", "--n_ckpt", "1", *extra])


@pytest.mark.slow
def test_stage0_trains_and_exports(scene_root, workspace):
    from nerf2mesh_tpu.data.provider import load_nerf_dataset
    from nerf2mesh_tpu.meshing.io import read_ply
    from nerf2mesh_tpu.utils.trainer import Trainer

    cfg = _cfg(scene_root, workspace, ["--iters", "300"])
    ds = load_nerf_dataset(cfg, "train")
    t = Trainer(cfg)
    m = t.train(ds)
    assert np.isfinite(float(m["loss"]))
    assert float(m["psnr"]) > 18.0          # learning happened

    assert os.path.exists(os.path.join(
        workspace, "checkpoints", "ngp_stage0_latest.ckpt"))

    t.save_mesh(resolution=48, decimate_target=5000)
    v, f = read_ply(os.path.join(workspace, "mesh_stage0", "mesh_0.ply"))
    assert len(v) > 10 and len(f) > 10
    assert np.abs(v).max() <= 1.0 + 1e-5


@pytest.mark.slow
def test_stage1_trains_on_stage0(scene_root, workspace):
    from nerf2mesh_tpu.data.provider import load_nerf_dataset
    from nerf2mesh_tpu.utils.trainer import Trainer

    # default --ssaa 2 exercises the supersampled crop path; lambda_lpips
    # exercises the perceptual crop loss
    cfg = _cfg(scene_root, workspace,
               ["--iters", "20", "--stage", "1", "--lambda_lpips", "0.01"])
    ds = load_nerf_dataset(cfg, "train")
    t = Trainer(cfg)
    assert t.load_checkpoint(stage=0)       # stage handoff
    t.setup_stage1(ds)
    # the raster compaction budget must cover the whole mesh: an
    # object-filling crop can overlap every face (round-1 failure mode:
    # silent triangle drops past K)
    assert t._raster_spec().max_tris >= t.stage1_mesh.num_faces
    m = t.train_stage1(ds)
    assert np.isfinite(float(m["loss"]))
    assert float(m.get("overflow", 0)) == 0
    # offsets got gradients and stayed finite (NaN-at-zero norm regression)
    off = np.asarray(t.state.params["vertices_offsets"])
    assert np.isfinite(off).all()
    assert np.abs(off).max() > 0


@pytest.mark.slow
def test_checkpoint_resume(scene_root, workspace):
    from nerf2mesh_tpu.data.provider import load_nerf_dataset
    from nerf2mesh_tpu.utils.trainer import Trainer

    cfg = _cfg(scene_root, workspace, ["--iters", "310"])
    ds = load_nerf_dataset(cfg, "train")
    t = Trainer(cfg)
    assert t.load_checkpoint()
    start = int(t.state.step)
    assert start >= 300
    t.train(ds)                             # continues to 310
    assert int(t.state.step) == 310


@pytest.mark.slow
def test_fused_eval_matches_host_loop(scene_root, workspace):
    """render_image(fused=True) — the one-dispatch lax.while_loop frame
    march — must match the host-compaction loop bit-for-bit in structure
    (same segments, same pool) and to float tolerance in values."""
    from nerf2mesh_tpu.data.provider import load_nerf_dataset
    from nerf2mesh_tpu.utils.trainer import Trainer

    cfg = _cfg(scene_root, workspace, ["--iters", "300"])
    ds = load_nerf_dataset(cfg, "val")
    t = Trainer(cfg)
    assert t.load_checkpoint(stage=0)
    pose = ds.poses[0]
    intr = ds.intrinsics_for(0) if hasattr(ds, "intrinsics_for") \
        else ds.intrinsics
    kw = dict(H=48, W=48, chunk=1024, seg_samples=16)
    a = t.render_image(pose, intr, fused=True, **kw)
    b = t.render_image(pose, intr, fused=False, **kw)
    assert np.isfinite(a["image"]).all()
    np.testing.assert_allclose(a["image"], b["image"], atol=2e-3)
    np.testing.assert_allclose(a["weights_sum"], b["weights_sum"], atol=2e-3)
    np.testing.assert_allclose(a["depth"], b["depth"], atol=5e-3)


@pytest.mark.slow
def test_stage1_quality_tracks_stage0(scene_root, workspace):
    """Regression gate for the round-2 silhouette failure: a stage-1 probe
    must not lose more than 2 dB against stage-0 on the same val GT (the
    reference's stage 1 IMPROVES on stage 0, renderer.py:816-921; round-2
    shipped -5.9 dB with the loss concentrated in a ~1px silhouette rim).
    Chip-scale version of this gate: workspace/runs RESULTS.md capstone."""
    from nerf2mesh_tpu.data.provider import load_nerf_dataset
    from nerf2mesh_tpu.utils.metrics import PSNRMeter
    from nerf2mesh_tpu.utils.trainer import Trainer

    cfg0 = _cfg(scene_root, workspace, ["--iters", "300"])
    ds_val = load_nerf_dataset(cfg0, "val")
    t0 = Trainer(cfg0)
    assert t0.load_checkpoint(stage=0)
    t0.metrics = [PSNRMeter()]
    r0 = t0.evaluate(ds_val, name="gate_s0")

    cfg1 = _cfg(scene_root, workspace,
                ["--iters", "300", "--stage", "1"])
    ds = load_nerf_dataset(cfg1, "train")
    t1 = Trainer(cfg1)
    t1.setup_stage1(ds)                      # before restore (main.py order)
    # always a FRESH stage-0 handoff (utils.py:587-589): resuming the 20-step
    # stage-1 ckpt the earlier smoke test leaves behind would gate on that
    # test's config instead of this one's
    assert t1.load_checkpoint(stage=0)
    t1.train_stage1(ds)
    t1.metrics = [PSNRMeter()]
    r1 = t1.evaluate(ds_val, name="gate_s1", stage1=True)
    assert r1["PSNR"] >= r0["PSNR"] - 2.0, \
        f"stage-1 {r1['PSNR']:.2f} dB vs stage-0 {r0['PSNR']:.2f} dB"


def test_checkpoint_nonstrict_load(tmp_path):
    """Schema-drifted checkpoints load partially with loud warnings
    (reference utils.py:1407-1473 non-strict load)."""
    import dataclasses
    import jax
    import jax.numpy as jnp
    import numpy as np
    from nerf2mesh_tpu.config import Config
    from nerf2mesh_tpu.utils.trainer import Trainer

    cfg = Config(path=str(tmp_path), workspace=str(tmp_path / "ws"),
                 grid_size=32, num_levels=4, log2_hashmap_size=10).finalize()
    tr = Trainer(cfg)
    tr.state = tr.state._replace(step=jnp.asarray(7, jnp.int32))
    tr.save_checkpoint()

    # same architecture: full restore including step
    tr2 = Trainer(cfg)
    assert tr2.load_checkpoint()
    assert int(tr2.state.step) == 7

    # drifted architecture (different table size): partial restore, no crash
    cfg3 = dataclasses.replace(cfg, log2_hashmap_size=11).finalize()
    tr3 = Trainer(cfg3)
    old = np.asarray(jax.tree_util.tree_leaves(tr3.state.params)[0]).copy()
    assert tr3.load_checkpoint(
        str(tmp_path / "ws" / "checkpoints" / "ngp_stage0_latest.ckpt"))
    # mismatched table kept fresh init; matching mlps restored
    assert int(tr3.state.step) == 0


def test_checkpoint_orbax_roundtrip(tmp_path):
    """--ckpt_backend orbax: checksummed directory checkpoints round-trip the
    full TrainState (incl. optimizer namedtuples) and degrade to the same
    non-strict partial restore on schema drift."""
    import dataclasses
    import jax
    import jax.numpy as jnp
    import numpy as np
    from nerf2mesh_tpu.config import Config
    from nerf2mesh_tpu.utils.trainer import Trainer

    cfg = Config(path=str(tmp_path), workspace=str(tmp_path / "ws"),
                 grid_size=32, num_levels=4, log2_hashmap_size=10,
                 ckpt_backend="orbax").finalize()
    tr = Trainer(cfg)
    tr.state = tr.state._replace(step=jnp.asarray(7, jnp.int32))
    tr.save_checkpoint()
    assert os.path.isdir(
        str(tmp_path / "ws" / "checkpoints" / "ngp_stage0_latest.ocp"))

    # full restore: exact pytree types (TrainState + optax states) rebuilt
    tr2 = Trainer(cfg)
    assert tr2.load_checkpoint()
    assert int(tr2.state.step) == 7
    np.testing.assert_array_equal(
        np.asarray(jax.tree_util.tree_leaves(tr2.state.params)[0]),
        np.asarray(jax.tree_util.tree_leaves(tr.state.params)[0]))
    assert jax.tree_util.tree_structure(tr2.state) == \
        jax.tree_util.tree_structure(tr.state)

    # a pickle-backend trainer auto-detects and loads the orbax directory
    cfgp = dataclasses.replace(cfg, ckpt_backend="pickle").finalize()
    trp = Trainer(cfgp)
    assert trp.load_checkpoint()
    assert int(trp.state.step) == 7

    # drifted architecture: partial restore (fresh table, optimizer restart)
    cfg3 = dataclasses.replace(cfg, log2_hashmap_size=11).finalize()
    tr3 = Trainer(cfg3)
    assert tr3.load_checkpoint(
        str(tmp_path / "ws" / "checkpoints" / "ngp_stage0_latest.ocp"))
    assert int(tr3.state.step) == 0
