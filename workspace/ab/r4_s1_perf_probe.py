"""Round-4 stage-1 perf attribution: the refine step runs 0.53 steps/s
(1.9 s/step) on chip vs the reference's ~20-30 nvdiffrast steps/s on V100 —
the slowest of the three driver metrics.  Decompose it:

  1. pipelined real stage-1 step timing (icosphere, _bench_stage1 setup)
  2. jax.profiler trace of 4 steps -> top device ops
  3. component microbenches (salted, fori-amortized):
     - rasterize_crop fwd / fwd+bwd at the step's raster spec + ssaa
     - field_rgb fwd+bwd at the supersampled pixel count
     - regularizer losses (laplacian + normal + edges) fwd+bwd

Usage: python workspace/ab/r4_s1_perf_probe.py
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
from nerf2mesh_tpu.meshing.io import write_ply

sys.path.insert(0, "/root/repo")
from bench import _icosphere

root = "/tmp/bench_scene"
if not os.path.exists(os.path.join(root, "transforms_train.json")):
    generate_synthetic_dataset(root, H=256, W=256, n_train=24, n_val=2,
                               n_test=2)

ws = "/tmp/r4s1perf_ws"
os.system(f"rm -rf {ws}")
cfg = dataclasses.replace(
    Config(path=root), bound=1.0, scale=0.8, dt_gamma=0.0, iters=1500,
    num_rays=4096, grid_size=128,
    workspace=ws).finalize()
ds = load_nerf_dataset(cfg, "train")
tr = Trainer(cfg)
images = jnp.asarray(ds.images)
poses = jnp.asarray(ds.poses)
intr = jnp.asarray(ds.intrinsics)
mvps = jnp.asarray(ds.mvps)

mdir = os.path.join(ws, "mesh_stage0")
os.makedirs(mdir, exist_ok=True)
mv, mf = _icosphere(6)
write_ply(os.path.join(mdir, "mesh_0.ply"), mv * 0.5, mf)
tr.setup_stage1(ds)
fn = tr._build_stage1_step()

state = tr.state
te, tc = tr.tri_errors, tr.tri_counts


def step(s):
    global state, te, tc
    state, te, tc, m = fn(state, te, tc, tr.mesh_v, tr.mesh_f,
                          tr.mesh_edges, tr.mesh_deg, tr.mesh_pairs,
                          tr.s1_counts, images, poses, mvps, intr,
                          tr.dynamics(s))
    return m


for s in range(4):
    m = step(s)
float(m["loss"])
t0 = time.perf_counter()
K = 8
for s in range(4, 4 + K):
    m = step(s)
float(m["loss"])
step_ms = (time.perf_counter() - t0) / K * 1e3
print(f"stage1 real step (pipelined x{K}): {step_ms:.1f} ms", flush=True)

# ---- profiler trace ---------------------------------------------------------
tdir = "/tmp/r4s1_trace"
os.system(f"rm -rf {tdir}")
try:
    with jax.profiler.trace(tdir):
        for s in range(20, 24):
            m = step(s)
        float(m["loss"])
    paths = glob.glob(f"{tdir}/**/*.trace.json.gz", recursive=True)
    if paths:
        ev = json.load(gzip.open(paths[0]))["traceEvents"]
        tot = {}
        for e in ev:
            if e.get("ph") == "X" and "dur" in e:
                tot[e.get("name", "")] = (tot.get(e.get("name", ""), 0.0)
                                          + e["dur"])
        top = sorted(tot.items(), key=lambda kv: -kv[1])[:40]
        print("== top trace ops (ms/step over 4 steps)", flush=True)
        for name, us in top:
            print(f"  {us/4/1000:9.2f} ms/step  {name[:110]}", flush=True)
except Exception as e:
    print(f"[WARN] profiler failed: {e}", flush=True)

# ---- component microbenches -------------------------------------------------
from nerf2mesh_tpu.models.rasterizer import rasterize_crop, transform_clip
from nerf2mesh_tpu.models.network import rgb as field_rgb
from nerf2mesh_tpu.models.stage1 import (laplacian_loss,
                                         normal_consistency_loss,
                                         edge_length_loss)

rspec0 = tr._raster_spec()
ss = max(int(cfg.ssaa), 1)
rspec = dataclasses.replace(rspec0, crop=rspec0.crop * ss,
                            max_frags=rspec0.max_frags * ss * ss)
Cs = rspec.crop
H = W = ds.H * ss
params = state.params
nspec = tr.net_spec
counts = tr.s1_counts


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


mvp0 = mvps[0]
origin = jnp.asarray([0, 0], jnp.int32)


def rast_fwd(salt, verts):
    clip = transform_clip(verts + salt * 1e-9, mvp0)
    r = rasterize_crop(clip, tr.mesh_f, origin, H, W, rspec,
                       f_valid=counts[1])
    return r["area"].sum() + r["depth"].sum() + r["bary"].sum()


def rast_fb(salt, verts):
    def loss(v):
        return rast_fwd(salt, v)
    l, g = jax.value_and_grad(loss)(verts)
    return l + g.sum()


timeit("raster fwd  (full supersampled crop)", rast_fwd, tr.mesh_v)
timeit("raster f+b  (full supersampled crop)", rast_fb, tr.mesh_v)

xq = jax.random.uniform(jax.random.PRNGKey(0), (Cs * Cs, 3),
                        minval=-0.5, maxval=0.5)
dq = jax.random.normal(jax.random.PRNGKey(1), (Cs * Cs, 3))
dq = dq / jnp.linalg.norm(dq, axis=-1, keepdims=True)


def field_fb(salt, params, xq, dq):
    def loss(p):
        c, _ = field_rgb(p, xq + salt * 1e-9, dq, nspec, None, "full")
        return c.sum()
    l, g = jax.value_and_grad(loss)(params)
    return l + jax.tree_util.tree_reduce(
        lambda a, b: a + b.sum(), g, jnp.float32(0))


timeit(f"field_rgb f+b ({Cs}x{Cs} px)", field_fb, params, xq, dq)


def regs_fb(salt, verts):
    def loss(v):
        v = v + salt * 1e-9
        return (laplacian_loss(v, tr.mesh_edges, tr.mesh_deg, counts[0],
                               counts[2])
                + normal_consistency_loss(v, tr.mesh_f, tr.mesh_pairs,
                                          counts[3])
                + edge_length_loss(v, tr.mesh_edges, counts[2]))
    l, g = jax.value_and_grad(loss)(verts)
    return l + g.sum()


timeit("regularizers f+b", regs_fb, tr.mesh_v)
print("done", flush=True)
