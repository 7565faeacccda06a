"""Multi-step scan dispatch (steps_per_dispatch): N scanned steps must be
bit-equivalent to N single-step dispatches — same RNG chain, same per-step
dynamics — so chunking is purely a wall-clock optimization."""
import dataclasses

import jax
import jax.numpy as jnp
import numpy as np

from nerf2mesh_tpu.config import Config
from nerf2mesh_tpu.data.provider import load_nerf_dataset
from nerf2mesh_tpu.data.synthetic import generate_synthetic_dataset
from nerf2mesh_tpu.utils.trainer import Trainer


def _setup(tmp_path, **over):
    root = str(tmp_path / "scene")
    generate_synthetic_dataset(root, H=48, W=48, n_train=3, n_val=1, n_test=1)
    kw = dict(bound=1.0, scale=0.8, dt_gamma=0.0, iters=64, num_rays=256,
              num_points=4096, max_steps=32, grid_size=32, diffuse_step=8,
              random_image_batch=True, adaptive_num_rays=False,
              progressive_level=True,
              workspace=str(tmp_path / "ws"))
    kw.update(over)
    cfg = dataclasses.replace(Config(path=root), **kw).finalize()
    ds = load_nerf_dataset(cfg, "train")
    tr = Trainer(cfg)
    return tr, ds


def test_scan_equals_single_steps(tmp_path):
    tr, ds = _setup(tmp_path)
    images = jnp.asarray(ds.images)
    poses = jnp.asarray(ds.poses)
    intr = jnp.asarray(ds.intrinsics)

    N = 6
    # arm A: N single-step dispatches
    state_a = tr.state
    fn1 = tr.step_fn_for(tr.cfg.num_rays, 1)
    for s in range(N):
        state_a, m_a = fn1(state_a, images, poses, intr, None,
                           tr.dynamics(s))

    # arm B: one N-step scan dispatch from the same initial state
    tr2, _ = _setup(tmp_path, workspace=str(tmp_path / "ws2"))
    fnN = tr2.step_fn_for(tr2.cfg.num_rays, N)
    state_b, m_b = fnN(tr2.state, images, poses, intr, None,
                       tr2.dynamics(0))

    assert int(state_a.step) == int(state_b.step) == N
    np.testing.assert_allclose(float(m_a["loss"]), float(m_b["loss"]),
                               rtol=1e-5)
    for (pa, va), (pb, vb) in zip(
            jax.tree_util.tree_flatten_with_path(state_a.params)[0],
            jax.tree_util.tree_flatten_with_path(state_b.params)[0]):
        assert pa == pb
        np.testing.assert_allclose(np.asarray(va), np.asarray(vb),
                                   atol=1e-6, err_msg=str(pa))


def test_traced_dynamics_matches_host(tmp_path):
    tr, _ = _setup(tmp_path)
    for s in (0, 5, 8, 31, 63):
        host = tr.dynamics(s)
        traced = jax.jit(tr._dynamics_traced)(jnp.asarray(s, jnp.int32))
        assert bool(host.full_shading) == bool(traced.full_shading), s
        assert int(host.max_level) == int(traced.max_level), s
        np.testing.assert_allclose(float(host.cos_anneal_ratio),
                                   float(traced.cos_anneal_ratio), rtol=1e-6)
        # f32 (traced) vs f64 (host) rounding at the 0.999 clamp boundary
        np.testing.assert_allclose(float(host.normal_epsilon),
                                   float(traced.normal_epsilon), rtol=1e-4)
        np.testing.assert_allclose(float(host.lambda_depth_ramp),
                                   float(traced.lambda_depth_ramp), rtol=1e-6)


def test_train_loop_chunked_runs(tmp_path):
    """train() with steps_per_dispatch=16 must finish all iters (log/eval/
    save fire on boundary CROSSING after each chunk, not by cutting chunk
    boundaries — chunk length stays constant to avoid fresh scan compiles)."""
    tr, ds = _setup(tmp_path, steps_per_dispatch=16, iters=40)
    out = tr.train(ds, None, max_steps=40)
    assert int(tr.state.step) == 40
    assert np.isfinite(float(out["loss"]))


def test_chunked_hooks_fire_once_per_crossing(tmp_path, monkeypatch):
    """Crossing semantics: with iters=64, spd=16, eval_interval=32 (n_eval=2)
    eval fires exactly twice (steps 32, 64) with boundary-aligned names, and
    exactly once when a chunk ends exactly on a multiple (no double-fire).
    save_interval=16 -> 4 saves."""
    tr, ds = _setup(tmp_path, steps_per_dispatch=16, iters=64)
    tr.cfg = dataclasses.replace(tr.cfg, n_eval=2, n_ckpt=4)
    evals, saves = [], []
    monkeypatch.setattr(tr, "evaluate",
                        lambda dataset, name=None, **kw: evals.append(name))
    monkeypatch.setattr(tr, "save_checkpoint",
                        lambda *a, **kw: saves.append(int(tr.state.step)))
    # evaluate is monkeypatched, so the train split stands in as valid_ds
    tr.train(ds, ds, max_steps=64)
    assert evals == ["step32", "step64"]
    assert len(saves) == 4
