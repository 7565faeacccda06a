"""Multi-device data parallelism (SURVEY §2.3): the sharded train steps'
collective math must equal the hand-computed mean of per-shard gradients.

The sharded paths draw DIFFERENT random rays/crops per device by design, so
"sharded step == unsharded step" parity is not the contract; the contract is
psum/pmean correctness: grad(pmean over shards of per-shard loss) ==
mean over shards of per-shard grads, followed by the same optax update.
These tests emulate each shard's loss on one device (same keys, same inputs)
and assert the sharded step's parameter update matches to tolerance.

Runs on the conftest-provided 8-device virtual CPU mesh.
"""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import optax
import pytest

from nerf2mesh_tpu.config import Config
from nerf2mesh_tpu.parallel.sharding import make_mesh
from nerf2mesh_tpu.utils.trainer import Trainer


@pytest.fixture(scope="module")
def scene_root(tmp_path_factory):
    from nerf2mesh_tpu.data.synthetic import generate_synthetic_dataset
    root = str(tmp_path_factory.mktemp("par_scene"))
    generate_synthetic_dataset(root, H=48, W=48, n_train=6, n_val=1,
                               n_test=1, ssaa=2)
    return root


def _cfg(scene_root, workspace, **kw):
    base = dict(
        path=scene_root, workspace=workspace, bound=1.0, scale=0.8,
        dt_gamma=0.0, num_rays=512, num_points=8192, samples_per_ray=16,
        coarse_per_ray=32, max_steps=64, grid_size=16, diffuse_step=0,
        random_image_batch=True, iters=100,
    )
    base.update(kw)
    return Config(**base).finalize()


def _tree_close(a, b, atol=2e-5):
    fa = jax.tree_util.tree_leaves(a)
    fb = jax.tree_util.tree_leaves(b)
    for x, y in zip(fa, fb):
        np.testing.assert_allclose(np.asarray(x), np.asarray(y), atol=atol,
                                   rtol=2e-4)


@pytest.mark.parametrize("n_dev", [2, 8])
def test_stage0_sharded_step_matches_manual_mean(scene_root, tmp_path, n_dev):
    from nerf2mesh_tpu.data.provider import load_nerf_dataset

    cfg = _cfg(scene_root, str(tmp_path / f"ws{n_dev}"))
    ds = load_nerf_dataset(cfg, "train")
    mesh = make_mesh((n_dev,), ("data",),
                     devices=jax.devices("cpu")[:n_dev])
    t = Trainer(cfg, mesh=mesh)
    t.mark_untrained(ds)
    images = jnp.asarray(ds.images)
    poses = jnp.asarray(ds.poses)
    intr = jnp.asarray(ds.intrinsics)
    dyn = t.dynamics(0)

    state0 = t.state
    params0 = jax.tree_util.tree_map(jnp.copy, state0.params)
    opt0 = jax.tree_util.tree_map(jnp.copy, state0.opt_state)
    key0 = jnp.copy(state0.key)          # the step donates state0's buffers

    # --- sharded step
    fn = t.step_fn_for(cfg.num_rays)
    state1, metrics = fn(state0, images, poses, intr, None, dyn)
    assert np.isfinite(float(metrics["loss"]))

    # --- manual emulation: same per-shard keys, mean of per-shard grads
    key, skey = jax.random.split(key0)
    keys = jax.random.split(skey, n_dev)
    per_shard = cfg.num_rays // n_dev

    def one_shard(params, k):
        def loss_fn(p):
            loss, m = t._loss_and_metrics(p, state1.render, k, images,
                                          poses, intr, None, dyn, per_shard)
            return loss, m
        (loss, m), g = jax.value_and_grad(loss_fn, has_aux=True)(params)
        return loss, g

    losses, grads = [], []
    for i in range(n_dev):
        l, g = one_shard(params0, keys[i])
        losses.append(float(l))
        grads.append(g)
    grad_mean = jax.tree_util.tree_map(
        lambda *gs: sum(gs) / n_dev, *grads)
    np.testing.assert_allclose(float(metrics["loss"]), np.mean(losses),
                               rtol=1e-4)

    updates, _ = t.optimizer.update(grad_mean, opt0, params0)
    params_manual = optax.apply_updates(params0, updates)
    _tree_close(state1.params, params_manual)


def test_stage1_sharded_step_matches_manual_mean(scene_root, tmp_path):
    """Stage-1 crop data parallelism: sharded step == mean of per-crop grads
    (each shard renders its own random image+crop)."""
    import os

    from nerf2mesh_tpu.data.provider import load_nerf_dataset
    from nerf2mesh_tpu.meshing.io import write_ply

    n_dev = 4
    ws = str(tmp_path / "s1ws")
    cfg = _cfg(scene_root, ws, stage=1, s1_crop=32, ssaa=2,
               s1_px_per_face=0.0, lambda_lpips=0.0)
    ds = load_nerf_dataset(cfg, "train")

    # tiny icosphere standing in for the stage-0 export
    from tests.test_stage1_padding import _icosphere
    v, f = _icosphere(1)
    os.makedirs(os.path.join(ws, "mesh_stage0"), exist_ok=True)
    write_ply(os.path.join(ws, "mesh_stage0", "mesh_0.ply"), v * 0.4, f)

    mesh = make_mesh((n_dev,), ("data",),
                     devices=jax.devices("cpu")[:n_dev])
    t = Trainer(cfg, mesh=mesh)
    t.setup_stage1(ds)

    images = jnp.asarray(ds.images)
    poses = jnp.asarray(ds.poses)
    mvps = jnp.asarray(ds.mvps)
    intr = jnp.asarray(ds.intrinsics)

    state0 = t.state
    params0 = jax.tree_util.tree_map(jnp.copy, state0.params)
    opt0 = jax.tree_util.tree_map(jnp.copy, state0.opt_state)
    key0 = jnp.copy(state0.key)          # the step donates state0's buffers
    te0 = jnp.copy(t.tri_errors)
    tc0 = jnp.copy(t.tri_counts)

    fn = t._build_stage1_step()
    state1, te1, tc1, metrics = fn(
        state0, t.tri_errors, t.tri_counts, t.mesh_v, t.mesh_f,
        t.mesh_edges, t.mesh_deg, t.mesh_pairs, t.s1_counts,
        images, poses, mvps, intr, t.dynamics(0))
    assert np.isfinite(float(metrics["loss"]))
    assert np.isfinite(float(metrics["psnr_white"]))

    # manual emulation: per-shard crop losses with the same derived keys,
    # mean of per-crop grads, same optax update
    from nerf2mesh_tpu.utils.trainer import make_stage1_crop_loss
    _, kstep = jax.random.split(key0)
    keys = jax.random.split(kstep, n_dev)
    crop_loss = make_stage1_crop_loss(cfg, t.net_spec, t._raster_spec())

    def one_crop(params, k):
        def lf(p):
            loss, (m, trig, lp) = crop_loss(
                p, k, t.mesh_v, t.mesh_f, t.mesh_edges, t.mesh_deg,
                t.mesh_pairs, t.s1_counts, images, poses, mvps, intr)
            return loss, m
        return jax.value_and_grad(lf, has_aux=True)(params)

    losses, grads = [], []
    for i in range(n_dev):
        (l, m), g = one_crop(params0, keys[i])
        losses.append(float(l))
        grads.append(g)
    grad_mean = jax.tree_util.tree_map(lambda *gs: sum(gs) / n_dev, *grads)
    np.testing.assert_allclose(float(metrics["loss"]), np.mean(losses),
                               rtol=1e-4)
    updates, _ = t.optimizer.update(grad_mean, opt0, params0)
    params_manual = optax.apply_updates(params0, updates)
    # Adam's first step is sign-dominated (update = ±lr for any |g| >> eps),
    # so coords whose gradient is ~0 can flip sign purely from fp32 summation
    # order (psum vs python sum).  Mask those; everything else must match.
    def check(a, b, g):
        a, b, g = np.asarray(a), np.asarray(b), np.abs(np.asarray(g))
        mask = g > 1e-6
        np.testing.assert_allclose(a[mask], b[mask], atol=2e-5, rtol=2e-4)

    jax.tree_util.tree_map(check, state1.params, params_manual, grad_mean)

    # aggregate contracts: error accumulators received all shards' fragments;
    # the update moved only real vertices (padding stays zero)
    assert float(jnp.sum(tc1 - tc0)) >= n_dev * (32 * 2) ** 2 * 0.05
    v_real = t._s1_real_shape[0]
    off = np.asarray(state1.params["vertices_offsets"])
    assert np.abs(off[v_real:]).max() == 0.0
    assert np.abs(off[:v_real]).max() > 0.0
