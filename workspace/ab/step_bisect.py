"""Bisect the composed-step slowdown (round-3: parts sum to ~250 ms but the
step runs at ~850 ms/step even inside scan16).

Times, all inside ONE jit fori_loop (so relay dispatch cost is excluded):
  A. value_and_grad(loss) only            (= the 230 ms probe, control)
  B. A + optax update + apply_updates
  C. B + EMA tree_map
  D. full step_fn body chained through TrainState (key chain + donation-like
     threading), i.e. exactly what scan16 runs per step.
Whichever hop jumps explains the gap; if D ~= A+parts, the gap is in the
dispatch layer instead (donation/scan/relay), not the math.
"""
import sys

sys.path.insert(0, "/root/repo")

import dataclasses
import os
import time

import jax
import jax.numpy as jnp
import optax

from nerf2mesh_tpu.config import Config
from nerf2mesh_tpu.data.provider import load_nerf_dataset
from nerf2mesh_tpu.data.synthetic import generate_synthetic_dataset
from nerf2mesh_tpu.utils.trainer import Trainer, TrainState

root = "/tmp/bench_scene"
if not os.path.exists(os.path.join(root, "transforms_train.json")):
    generate_synthetic_dataset(root, H=256, W=256, n_train=24, n_val=2,
                               n_test=2)

NR = int(sys.argv[1]) if len(sys.argv) > 1 else 32768
cfg = dataclasses.replace(
    Config(path=root), bound=1.0, scale=0.8, dt_gamma=0.0, iters=30000,
    num_rays=NR, num_points=2**18, max_steps=1024, grid_size=128,
    diffuse_step=100, random_image_batch=True, background="random",
    mark_untrained=True, workspace="/tmp/bisect_ws").finalize()
ds = load_nerf_dataset(cfg, "train")
tr = Trainer(cfg)
tr.mark_untrained(ds)
images = jnp.asarray(ds.images)
poses = jnp.asarray(ds.poses)
intr = jnp.asarray(ds.intrinsics)

fn = tr.step_fn_for(NR)
state = tr.state
for step in range(48):
    if step % 16 == 0:
        tr.state = state; tr.update_grid(step); state = tr.state
    state, m = fn(state, images, poses, intr, None, tr.dynamics(step))
    if (step + 1) % 16 == 0:
        tr._update_encode_routing(m)
print("warmed. routing=", tr.net_spec.encode_gather_levels, flush=True)
tr.state = state

dyn = tr.dynamics(100)
opt = tr.optimizer


def timeit(name, fn_, K=4):
    @jax.jit
    def loop(salt):
        def body(i, carry):
            return fn_(salt + jnp.float32(i) * 1e-9, carry)
        return jax.lax.fori_loop(0, K, body, salt)
    float(loop(jnp.float32(3)))
    t0 = time.perf_counter()
    float(loop(jnp.float32(1)))
    print(f"{name}: {(time.perf_counter()-t0)/K*1e3:.1f} ms", flush=True)


key0 = jax.random.PRNGKey(42)
st = tr.state


def loss_fn(params, k, salt):
    l, mm = tr._loss_and_metrics(params, st.render, k, images, poses, intr,
                                 None, dyn, NR)
    return l + salt * 0.0, mm


def probe_A(salt, carry):
    k = jax.random.fold_in(key0, jnp.int32(carry * 1e6))
    (l, mm), g = jax.value_and_grad(loss_fn, has_aux=True)(st.params, k, salt)
    return carry + l + jax.tree_util.tree_leaves(g)[0].ravel()[0]

timeit("A: value_and_grad(loss)", probe_A)


def probe_B(salt, carry):
    k = jax.random.fold_in(key0, jnp.int32(carry * 1e6))
    (l, mm), g = jax.value_and_grad(loss_fn, has_aux=True)(st.params, k, salt)
    upd, _ = opt.update(g, st.opt_state, st.params)
    p2 = optax.apply_updates(st.params, upd)
    return carry + l + jax.tree_util.tree_leaves(p2)[0].ravel()[0]

timeit("B: A + optax", probe_B)


def probe_C(salt, carry):
    k = jax.random.fold_in(key0, jnp.int32(carry * 1e6))
    (l, mm), g = jax.value_and_grad(loss_fn, has_aux=True)(st.params, k, salt)
    upd, _ = opt.update(g, st.opt_state, st.params)
    p2 = optax.apply_updates(st.params, upd)
    ema = jax.tree_util.tree_map(lambda e, p: e * 0.95 + p * 0.05,
                                 st.ema_params, p2)
    return (carry + l + jax.tree_util.tree_leaves(p2)[0].ravel()[0]
            + jax.tree_util.tree_leaves(ema)[0].ravel()[0])

timeit("C: B + EMA", probe_C)

# D: the real per-step body threaded through TrainState inside a scan of 4
raw = tr._build_step(NR, n_steps=4)
s2, mm = raw(tr.state, images, poses, intr, None, dyn)
float(mm["loss"])
# rebuild state (donated) and time
tr.state = s2
t0 = time.perf_counter()
s3, mm = raw(s2, images, poses, intr, None, dyn)
float(mm["loss"])
d4 = (time.perf_counter() - t0) / 4 * 1e3
print(f"D: scan4 full step body: {d4:.1f} ms/step", flush=True)
tr.state = s3

# E: scan4 with metrics reduced to loss only (fetch cost isolation)
print("done", flush=True)
