import sys; sys.path.insert(0, "/root/repo")
"""Split the unexplained ~550 ms of per-step device work: ray-sized vs
params-sized.  Times the REAL pipelined step at NR in {4096, 32768} and a
fwd-only variant, plus to_splat fwd+bwd in isolation (suspected: it is
params-dependent, so loop-invariant-hoisted OUT of the fori probes but run
EVERY real step — 6.5M-row gather + scatter backward ~ 130 ms)."""
import dataclasses, os, time
import jax, jax.numpy as jnp
import numpy as np
from nerf2mesh_tpu.config import Config
from nerf2mesh_tpu.data.provider import load_nerf_dataset
from nerf2mesh_tpu.data.synthetic import generate_synthetic_dataset
from nerf2mesh_tpu.utils.trainer import Trainer

root = "/tmp/bench_scene"

cfg = dataclasses.replace(
    Config(path=root), bound=1.0, scale=0.8, dt_gamma=0.0, iters=30000,
    num_rays=32768, num_points=2**18, max_steps=1024, grid_size=128,
    diffuse_step=100, random_image_batch=True,
    mark_untrained=True, workspace="/tmp/tail_ws2").finalize()
ds = load_nerf_dataset(cfg, "train")
tr = Trainer(cfg)
tr.mark_untrained(ds)
images = jnp.asarray(ds.images); poses = jnp.asarray(ds.poses)
intr = jnp.asarray(ds.intrinsics)

state = tr.state
fn = tr.step_fn_for(32768, 1)
for step in range(48):
    if step % 16 == 0:
        tr.state = state; tr.update_grid(step); state = tr.state
    state, m = fn(state, images, poses, intr, None, tr.dynamics(step))
    if (step + 1) % 16 == 0:
        tr._update_encode_routing(m)
tr.state = state
print("routing:", tr.net_spec.encode_gather_levels, flush=True)


def time_step(tag, nr, K=8):
    f = tr.step_fn_for(nr, 1)
    st = jax.tree_util.tree_map(jnp.copy, tr.state)
    for _ in range(2):
        st, mm = f(st, images, poses, intr, None, tr.dynamics(100))
    float(mm["loss"])
    t0 = time.perf_counter()
    for i in range(K):
        st, mm = f(st, images, poses, intr, None, tr.dynamics(100 + i))
    float(mm["loss"])
    print(f"step[NR={nr}{tag}]: {(time.perf_counter()-t0)/K*1e3:.1f} ms",
          flush=True)


time_step("", 32768)
time_step("", 4096)
time_step("", 1024)

# --- to_splat in a param-varying pipelined loop (not hoistable)
from nerf2mesh_tpu.ops.splat_encode import to_splat, from_splat
gspec = tr.net_spec.density_grid_spec
table = tr.state.params["table"]


@jax.jit
def ts_fwd(t):
    return to_splat(t, gspec).sum()


@jax.jit
def ts_fwd_bwd(t):
    def loss(tt):
        return to_splat(tt, gspec).sum()
    l, g = jax.value_and_grad(loss)(t)
    return l + g.ravel()[0]


for fnm, f in (("to_splat fwd", ts_fwd), ("to_splat fwd+bwd", ts_fwd_bwd)):
    t2 = table * 1.000001
    float(f(t2))
    t0 = time.perf_counter()
    K = 4
    acc = 0.0
    for i in range(K):
        t2 = t2 * (1.0 + 1e-9)   # param-varying: no relay cache
        acc = float(f(t2))
    print(f"{fnm}: {(time.perf_counter()-t0)/K*1e3:.1f} ms", flush=True)
