import sys; sys.path.insert(0, "/root/repo")
"""Attribute the ~480 ms of per-step device work OUTSIDE render_train
(stoch_decompose: render fwd+bwd 325 ms fori-amortized vs full step 808 ms
pipelined; chunked dispatch gave no win, so it is real device time).

Times full step_fn variants: baseline, lambda_tv=0, EMA identity, Adam-only
on the table, loss-only (no optimizer).  All fori/pipelined, fetch-scalar.
"""
import dataclasses, os, time
import jax, jax.numpy as jnp
import numpy as np
from nerf2mesh_tpu.config import Config
from nerf2mesh_tpu.data.provider import load_nerf_dataset
from nerf2mesh_tpu.data.synthetic import generate_synthetic_dataset
from nerf2mesh_tpu.utils.trainer import Trainer

root = "/tmp/bench_scene"
if not os.path.exists(os.path.join(root, "transforms_train.json")):
    generate_synthetic_dataset(root, H=256, W=256, n_train=24, n_val=2,
                               n_test=2)

NR = 32768


def build(tag, **over):
    cfg = dataclasses.replace(
        Config(path=root), bound=1.0, scale=0.8, dt_gamma=0.0, iters=30000,
        num_rays=NR, num_points=2**18, max_steps=1024, grid_size=128,
        diffuse_step=100, random_image_batch=True,
        mark_untrained=True, workspace="/tmp/tail_ws", **over).finalize()
    ds = load_nerf_dataset(cfg, "train")
    tr = Trainer(cfg)
    tr.mark_untrained(ds)
    return tr, ds


def warm(tr, ds, steps=48):
    images = jnp.asarray(ds.images); poses = jnp.asarray(ds.poses)
    intr = jnp.asarray(ds.intrinsics)
    state = tr.state
    fn = tr.step_fn_for(NR, 1)
    for step in range(steps):
        if step % 16 == 0:
            tr.state = state; tr.update_grid(step); state = tr.state
        state, m = fn(state, images, poses, intr, None, tr.dynamics(step))
        if (step + 1) % 16 == 0:
            tr._update_encode_routing(m)
    tr.state = state
    return images, poses, intr, m


def time_step(tag, tr, images, poses, intr, K=8):
    fn = tr.step_fn_for(NR, 1)
    # the step donates its input state — run each variant on a fresh copy so
    # tr.state survives for the next variant
    state = jax.tree_util.tree_map(jnp.copy, tr.state)
    for _ in range(2):
        state, m = fn(state, images, poses, intr, None, tr.dynamics(100))
    float(m["loss"])
    t0 = time.perf_counter()
    for i in range(K):
        state, m = fn(state, images, poses, intr, None, tr.dynamics(100 + i))
    float(m["loss"])
    print(f"step[{tag}]: {(time.perf_counter()-t0)/K*1e3:.1f} ms",
          flush=True)


tr, ds = build("base")
images, poses, intr, m = warm(tr, ds)
print("routing:", tr.net_spec.encode_gather_levels, flush=True)
time_step("base", tr, images, poses, intr)

# --- lambda_tv = 0
tr.cfg = dataclasses.replace(tr.cfg, lambda_tv=0.0)
tr._step_cache = {}
time_step("tv=0", tr, images, poses, intr)

# --- also specular + entropy off (tiny, but isolates)
tr.cfg = dataclasses.replace(tr.cfg, lambda_tv=0.0, lambda_entropy=0.0,
                             lambda_specular=0.0)
tr._step_cache = {}
time_step("tv=0,ent=0,spec=0", tr, images, poses, intr)

# --- optimizer microbench: Adam update + EMA on the real param tree
params = tr.state.params
opt = tr.optimizer
ost = tr.state.opt_state
grads = jax.tree_util.tree_map(jnp.ones_like, params)


@jax.jit
def opt_loop(p, o, e):
    def body(i, carry):
        p, o, e = carry
        g = jax.tree_util.tree_map(
            lambda x: x * (1.0 + i * 1e-9), grads)
        import optax
        up, o2 = opt.update(g, o, p)
        p2 = optax.apply_updates(p, up)
        e2 = jax.tree_util.tree_map(lambda a, b: a * 0.95 + b * 0.05, e, p2)
        return (p2, o2, e2)
    return jax.lax.fori_loop(0, 8, body, (p, o, e))


r = opt_loop(params, ost, tr.state.ema_params)
float(jax.tree_util.tree_leaves(r[0])[0].ravel()[0])
t0 = time.perf_counter()
r = opt_loop(params, ost, tr.state.ema_params)
float(jax.tree_util.tree_leaves(r[0])[0].ravel()[0])
print(f"adam+ema x1 (fori-amortized): "
      f"{(time.perf_counter()-t0)/8*1e3:.1f} ms", flush=True)
