"""Validate the round-4 stochastic-residual encode fix on chip.

Measures, on REAL pooled points at early-training occupancy (the regime
where the old budgeted-residual cond took its slow full-gather fallback):
  1. encode fwd / fwd+bwd, stochastic (train path)   [target: f+b <= ~250 ms]
  2. encode fwd / fwd+bwd, exact (eval path, halved compaction)
  3. the real pipelined train step                    [target: <= ~350 ms]
Then a quick quality A/B is left to hard_full_recipe / the capstones (the
estimator is unbiased by construction + unit test).

Usage: python workspace/ab/r4_encode_fix_bench.py
"""
import sys

sys.path.insert(0, "/root/repo")

import dataclasses
import os
import time

import jax
import jax.numpy as jnp
import numpy as np

from nerf2mesh_tpu.config import Config
from nerf2mesh_tpu.data.provider import load_nerf_dataset
from nerf2mesh_tpu.data.synthetic import generate_synthetic_dataset
from nerf2mesh_tpu.utils.trainer import Trainer

NR = 32768

root = "/tmp/bench_scene"
if not os.path.exists(os.path.join(root, "transforms_train.json")):
    generate_synthetic_dataset(root, H=256, W=256, n_train=24, n_val=2,
                               n_test=2)

cfg = dataclasses.replace(
    Config(path=root), bound=1.0, scale=0.8, dt_gamma=0.0, iters=30000,
    num_rays=NR, num_points=2**18, max_steps=1024, grid_size=128,
    diffuse_step=100, random_image_batch=True, background="random",
    mark_untrained=True, workspace="/tmp/r4fix_ws").finalize()
ds = load_nerf_dataset(cfg, "train")
tr = Trainer(cfg)
tr.mark_untrained(ds)
images = jnp.asarray(ds.images)
poses = jnp.asarray(ds.poses)
intr = jnp.asarray(ds.intrinsics)

fn = tr.step_fn_for(NR)
state = tr.state
for step in range(64):
    if step % 16 == 0:
        tr.state = state
        tr.update_grid(step)
        state = tr.state
    state, m = fn(state, images, poses, intr, None, tr.dynamics(step))
    if (step + 1) % 16 == 0:
        tr._update_encode_routing(m)
        fn = tr.step_fn_for(NR)
print("warmed. pts=", int(m["num_points"]),
      " routing=", tr.net_spec.encode_gather_levels, flush=True)
tr.state = state

for _ in range(2):
    state, m = fn(state, images, poses, intr, None, tr.dynamics(100))
float(m["loss"])
t0 = time.perf_counter()
K = 8
for i in range(K):
    state, m = fn(state, images, poses, intr, None, tr.dynamics(100 + i))
float(m["loss"])
print(f"real step (pipelined x{K}): "
      f"{(time.perf_counter()-t0)/K*1e3:.1f} ms", flush=True)

# ---- encode microbench on real pool points ---------------------------------
from nerf2mesh_tpu.data.rays import get_rays
from nerf2mesh_tpu.models.renderer import render_train
from nerf2mesh_tpu.ops.splat_encode import splat_encode

P = tr.pool_size
rspec, nspec = tr.render_spec, tr.net_spec
gspec = nspec.density_grid_spec
aabb = jnp.asarray(tr._aabb)
params = state.params

kidx = jax.random.randint(jax.random.PRNGKey(11), (NR,), 0,
                          images.shape[0] * images.shape[1] * images.shape[2])
img_i = kidx // (images.shape[1] * images.shape[2])
pix = kidx % (images.shape[1] * images.shape[2])
r = get_rays(poses[img_i], (intr[0], intr[1], intr[2], intr[3]),
             images.shape[1], images.shape[2], indices=pix)
bg = jnp.ones((NR, 3))


@jax.jit
def harvest(params, occ, ro, rd):
    out = render_train(params, occ, ro, rd, bg, jax.random.PRNGKey(3),
                       rspec, nspec, shading="full", perturb=True,
                       aabb=aabb, pool_size=P)
    return out["xyzs"]


xp = jnp.asarray(np.asarray(
    harvest(params, state.render.occ_grid, r["rays_o"], r["rays_d"])))
table = params["table"]


def timeit(name, fn_, *args, K=4):
    @jax.jit
    def loop(salt, *a):
        def body(i, acc):
            return acc + fn_(salt + jnp.float32(i) * 1e-9, *a)
        return jax.lax.fori_loop(0, K, body, salt)
    float(loop(jnp.float32(3), *args))
    t0 = time.perf_counter()
    float(loop(jnp.float32(1), *args))
    print(f"{name}: {(time.perf_counter()-t0)/K*1e3:.1f} ms", flush=True)


def enc(salt, table, xp, stoch):
    f = splat_encode(table, xp + salt * 1e-9, gspec,
                     gather_levels=nspec.encode_gather_levels,
                     stochastic=stoch)[0]
    return f.sum()


def enc_grad(salt, table, xp, stoch):
    def loss(t):
        return jnp.sum(splat_encode(t, xp + salt * 1e-9, gspec,
                                    gather_levels=nspec.encode_gather_levels,
                                    stochastic=stoch)[0])
    l, g = jax.value_and_grad(loss)(table)
    return l + g.ravel()[0]


timeit("encode fwd  (real pts, stoch)", lambda s, t, x: enc(s, t, x, True),
       table, xp)
timeit("encode f+b  (real pts, stoch)",
       lambda s, t, x: enc_grad(s, t, x, True), table, xp)
timeit("encode fwd  (real pts, exact)", lambda s, t, x: enc(s, t, x, False),
       table, xp)
timeit("encode f+b  (real pts, exact)",
       lambda s, t, x: enc_grad(s, t, x, False), table, xp)
print("done", flush=True)
