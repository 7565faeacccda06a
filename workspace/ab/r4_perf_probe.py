"""Round-4 perf attribution: profile the REAL train step and microbench the
encoder on REAL pooled sample positions.

Round-3's stoch_decompose probes disagree with each other (encode fwd+bwd
789 ms > field fwd+bwd 554 ms > render fwd+bwd 323 ms, all "components" of
the same 807 ms step) because (a) the encode/field probes used uniform
random points — which blow the kernel levels' residual budget and take the
lax.cond full-gather fallback that real (clustered, morton-sorted) training
points never take — and (b) the loss probe's salt didn't feed the loss, so
XLA hoisted the body out of the timing loop.  This probe fixes both:

  1. jax.profiler trace of 4 real steps -> top device ops by total time
     (parsed from the trace proto, no tensorboard needed).
  2. fori-amortized microbenches on the REAL pool positions harvested from
     a render_train call (salt feeds the input).

Usage: python workspace/ab/r4_perf_probe.py [num_rays=32768]
"""
import sys

sys.path.insert(0, "/root/repo")

import dataclasses
import glob
import gzip
import json
import os
import time

import jax
import jax.numpy as jnp
import numpy as np

from nerf2mesh_tpu.config import Config
from nerf2mesh_tpu.data.provider import load_nerf_dataset
from nerf2mesh_tpu.data.synthetic import generate_synthetic_dataset
from nerf2mesh_tpu.utils.trainer import Trainer

NR = int(sys.argv[1]) if len(sys.argv) > 1 else 32768

root = "/tmp/bench_scene"
if not os.path.exists(os.path.join(root, "transforms_train.json")):
    generate_synthetic_dataset(root, H=256, W=256, n_train=24, n_val=2,
                               n_test=2)

cfg = dataclasses.replace(
    Config(path=root), bound=1.0, scale=0.8, dt_gamma=0.0, iters=30000,
    num_rays=NR, num_points=2**18, max_steps=1024, grid_size=128,
    diffuse_step=100, random_image_batch=True, background="random",
    mark_untrained=True, workspace="/tmp/r4perf_ws").finalize()
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
print("warmed. pts=", int(m["num_points"]),
      " routing=", tr.net_spec.encode_gather_levels, flush=True)
tr.state = state

# ---- 1. real step timing (pipelined) + profiler trace ----------------------
for _ in range(2):
    state, m = fn(state, images, poses, intr, None, tr.dynamics(100))
float(m["loss"])
t0 = time.perf_counter()
K = 8
for i in range(K):
    state, m = fn(state, images, poses, intr, None, tr.dynamics(100 + i))
float(m["loss"])
step_ms = (time.perf_counter() - t0) / K * 1e3
print(f"real step (pipelined x{K}): {step_ms:.1f} ms", flush=True)

tdir = "/tmp/r4perf_trace"
os.system(f"rm -rf {tdir}")
try:
    with jax.profiler.trace(tdir):
        for i in range(4):
            state, m = fn(state, images, poses, intr, None,
                          tr.dynamics(120 + i))
        float(m["loss"])
    # parse the chrome trace: sum device-op durations by name
    paths = glob.glob(f"{tdir}/**/*.trace.json.gz", recursive=True)
    print("trace files:", paths, flush=True)
    if paths:
        ev = json.load(gzip.open(paths[0]))["traceEvents"]
        tot = {}
        for e in ev:
            if e.get("ph") == "X" and "dur" in e:
                pid_name = e.get("pid")
                name = e.get("name", "")
                tot[name] = tot.get(name, 0.0) + e["dur"]
        top = sorted(tot.items(), key=lambda kv: -kv[1])[:40]
        print("== top trace ops (us total over 4 steps)", flush=True)
        for name, us in top:
            print(f"  {us/4/1000:9.2f} ms/step  {name[:110]}", flush=True)
except Exception as e:
    print(f"[WARN] profiler failed: {e}", flush=True)

# ---- 2. harvest REAL pool points from render_train -------------------------
from nerf2mesh_tpu.data.rays import get_rays
from nerf2mesh_tpu.models.renderer import render_train

P = tr.pool_size
rspec, nspec = tr.render_spec, tr.net_spec
gspec = nspec.density_grid_spec
aabb = jnp.asarray(tr._aabb)
occ = state.render.occ_grid
params = state.params

kidx = jax.random.randint(jax.random.PRNGKey(11), (NR,), 0,
                          images.shape[0] * images.shape[1] * images.shape[2])
img_i = kidx // (images.shape[1] * images.shape[2])
pix = kidx % (images.shape[1] * images.shape[2])
r = get_rays(poses[img_i], (intr[0], intr[1], intr[2], intr[3]),
             images.shape[1], images.shape[2], indices=pix)
ro, rd = r["rays_o"], r["rays_d"]
bg = jnp.ones((NR, 3))


@jax.jit
def harvest(params, occ, ro, rd):
    out = render_train(params, occ, ro, rd, bg, jax.random.PRNGKey(3),
                       rspec, nspec, shading="full", perturb=True,
                       aabb=aabb, pool_size=P)
    return out["xyzs"], out["pp_valid"], out["num_points"]


xp, ppv, npts = harvest(params, occ, ro, rd)
xp = jnp.asarray(np.asarray(xp))          # real, morton-ordered pool points
print(f"harvested pool: {int(npts)} valid of {P}", flush=True)

# ---- 3. microbenches on real points ----------------------------------------
from nerf2mesh_tpu.ops.splat_encode import splat_encode

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

# field (encoder + MLPs) on real points
from nerf2mesh_tpu.models.network import field_forward

dirs = rd[jax.random.randint(jax.random.PRNGKey(5), (P,), 0, NR)]


def fld(salt, params, xp, dirs):
    s, c, sp, cnt = field_forward(params, xp + salt * 1e-9, dirs, nspec,
                                  jnp.asarray(True))
    return s.sum() + c.sum()


def fld_grad(salt, params, xp, dirs):
    def loss(p):
        s, c, sp, _ = field_forward(p, xp + salt * 1e-9, dirs, nspec,
                                    jnp.asarray(True))
        return jnp.sum(s) * 1e-3 + jnp.sum(c)
    l, g = jax.value_and_grad(loss)(params)
    return l + jax.tree_util.tree_leaves(g)[0].ravel()[0]


timeit("field fwd  (real pts)", fld, params, xp, dirs)
timeit("field f+b  (real pts)", fld_grad, params, xp, dirs)

# render_train fwd+bwd with the REAL ray batch and a full-ish loss seed
def rt_grad(salt, params, occ, ro, rd):
    def loss(p):
        out = render_train(p, occ, ro + salt * 1e-9, rd, bg,
                           jax.random.PRNGKey(7), rspec, nspec,
                           shading="full", perturb=True, aabb=aabb,
                           pool_size=P)
        return (jnp.mean(out["image"] ** 2)
                + 0.1 * jnp.mean(out["weights_sum"] ** 2)
                + 1e-5 * jnp.mean(out["speculars"] ** 2))
    l, g = jax.value_and_grad(loss)(params)
    return l + jax.tree_util.tree_leaves(g)[0].ravel()[0]


timeit("render f+b (real rays, full-ish loss)", rt_grad, params, occ, ro, rd)
print("done", flush=True)
