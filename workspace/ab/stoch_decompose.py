import sys; sys.path.insert(0, "/root/repo")
"""Decompose the STOCHASTIC train step (the shipped default) on chip.

Times each pipeline piece separately at steady-state routing so the gap
between the primitive-rate estimate (~110 ms of gather/scatter at 262k
points x 10 fine levels) and the measured ~0.6 s/step can be attributed.
Pieces: sampler, encode fwd, encode fwd+bwd, MLPs alone, field, full step
fwd, full step fwd+bwd, plus optimizer/EMA overhead via the real step_fn.
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

NR = int(sys.argv[1]) if len(sys.argv) > 1 else 32768
cfg = dataclasses.replace(
    Config(path=root), bound=1.0, scale=0.8, dt_gamma=0.0, iters=30000,
    num_rays=NR, num_points=2**18, max_steps=1024, grid_size=128,
    diffuse_step=100, random_image_batch=True, background="random",
    mark_untrained=True, workspace="/tmp/dec_ws").finalize()
assert cfg.stochastic_fine
ds = load_nerf_dataset(cfg, "train")
tr = Trainer(cfg)
tr.mark_untrained(ds)
images = jnp.asarray(ds.images); poses = jnp.asarray(ds.poses)
intr = jnp.asarray(ds.intrinsics)

fn = tr.step_fn_for(NR)
state = tr.state
for step in range(64):
    if step % 16 == 0:
        tr.state = state; tr.update_grid(step); state = tr.state
    state, m = fn(state, images, poses, intr, None, tr.dynamics(step))
    if (step + 1) % 16 == 0:
        tr._update_encode_routing(m)
print("warmed. pts=", int(m["num_points"]),
      " routing=", tr.net_spec.encode_gather_levels, flush=True)
tr.state = state

from nerf2mesh_tpu.ops.sampling import near_far_from_aabb, sample_rays
from nerf2mesh_tpu.ops.splat_encode import splat_encode
from nerf2mesh_tpu.ops.hashgrid import HashGridSpec
from nerf2mesh_tpu.models.renderer import render_train
from nerf2mesh_tpu.models.network import field_forward

rspec, nspec = tr.render_spec, tr.net_spec
gspec = nspec.density_grid_spec
key = jax.random.PRNGKey(0)
ro = jax.random.normal(key, (NR, 3)) * 0.05 + jnp.asarray([0, 0, 2.5])
rd = jax.random.normal(jax.random.PRNGKey(1), (NR, 3))
rd = rd / jnp.linalg.norm(rd, axis=-1, keepdims=True)
rd = rd.at[:, 2].set(-jnp.abs(rd[:, 2]) - 0.8)
rd = rd / jnp.linalg.norm(rd, axis=-1, keepdims=True)
bg = jnp.ones((NR, 3))
occ = tr.state.render.occ_grid
aabb = jnp.asarray(tr._aabb)


def timeit(name, fn_, *args, K=4):
    @jax.jit
    def loop(salt, *a):
        def body(i, acc):
            r = fn_(salt + jnp.float32(i) * 1e-9, *a)
            return acc + r
        return jax.lax.fori_loop(0, K, body, salt)
    float(loop(jnp.float32(3), *args))
    t0 = time.perf_counter()
    float(loop(jnp.float32(1), *args))
    print(f"{name}: {(time.perf_counter()-t0)/K*1e3:.1f} ms", flush=True)


def f_sample(salt, occ, ro, rd):
    nears, fars = near_far_from_aabb(ro + salt * 1e-9, rd, aabb,
                                     rspec.min_near)
    mm = sample_rays(ro, rd, occ, nears, fars,
                     num_coarse=rspec.num_coarse, num_fine=rspec.num_fine,
                     grid_size=rspec.grid_size, cascades=rspec.cascades,
                     bound=rspec.bound, contracted=rspec.contract,
                     dt_gamma=rspec.dt_gamma, max_steps=rspec.max_steps,
                     perturb=False)
    return mm.ts.sum() + mm.total.astype(jnp.float32)

timeit("sample_rays", f_sample, occ, ro, rd)

P = tr.pool_size
print("pool:", P, flush=True)
params = tr.state.params
table = params["table"]
xp = jax.random.uniform(jax.random.PRNGKey(2), (P, 3),
                        minval=0.25, maxval=0.75)
dp = rd[jax.random.randint(jax.random.PRNGKey(3), (P,), 0, NR)]


def f_enc(salt, table, xp):
    f = splat_encode(table, xp + salt * 1e-9, gspec,
                     gather_levels=nspec.encode_gather_levels,
                     stochastic=True)[0]
    return f.sum()

timeit("encode fwd (pool, stoch)", f_enc, table, xp)


def f_enc_grad(salt, table, xp):
    def loss(t):
        return jnp.sum(splat_encode(t, xp + salt * 1e-9, gspec,
                                    gather_levels=nspec.encode_gather_levels,
                                    stochastic=True)[0])
    l, g = jax.value_and_grad(loss)(table)
    return l + g.ravel()[0]

timeit("encode fwd+bwd (pool, stoch)", f_enc_grad, table, xp)


def f_enc_exact(salt, table, xp):
    f = splat_encode(table, xp + salt * 1e-9, gspec,
                     gather_levels=nspec.encode_gather_levels,
                     stochastic=False)[0]
    return f.sum()

timeit("encode fwd (pool, exact)", f_enc_exact, table, xp)


# MLPs alone: feed a precomputed feature tensor through the nets
feat = jax.random.normal(jax.random.PRNGKey(4),
                         (P, gspec.num_levels * gspec.level_dim))


def f_mlp(salt, params, feat, dp):
    from nerf2mesh_tpu.models.network import mlps_from_features
    s, c = mlps_from_features(params, feat + salt * 1e-9, dp, nspec)
    return s.sum() + c.sum()

try:
    timeit("MLPs fwd (pool)", f_mlp, params, feat, dp)
except ImportError:
    print("MLPs fwd: (no mlps_from_features helper; skipped)", flush=True)


def f_field(salt, params, xp, dp):
    s, c, sp, cnt = field_forward(params, xp + salt * 1e-9, dp, nspec,
                                  jnp.asarray(True))
    return s.sum() + c.sum()

timeit("field fwd (pool)", f_field, params, xp, dp)


def f_field_grad(salt, params, xp, dp):
    def loss(p):
        s, c, sp, _ = field_forward(p, xp + salt * 1e-9, dp, nspec,
                                    jnp.asarray(True))
        return jnp.sum(s) * 1e-3 + jnp.sum(c)
    l, g = jax.value_and_grad(loss)(params)
    return l + jax.tree_util.tree_leaves(g)[0].ravel()[0]

timeit("field fwd+bwd (pool)", f_field_grad, params, xp, dp)


def f_step(salt, params, occ, ro, rd):
    out = render_train(params, occ, ro + salt * 1e-9, rd, bg,
                       jax.random.PRNGKey(7), rspec, nspec, shading="full",
                       perturb=True, aabb=aabb, pool_size=P)
    return out["image"].sum()

timeit("render_train fwd", f_step, params, occ, ro, rd)


def f_step_grad(salt, params, occ, ro, rd):
    def loss(p):
        out = render_train(p, occ, ro + salt * 1e-9, rd, bg,
                           jax.random.PRNGKey(7), rspec, nspec,
                           shading="full", perturb=True, aabb=aabb,
                           pool_size=P)
        return jnp.mean(out["image"] ** 2)
    l, g = jax.value_and_grad(loss)(params)
    return l + jax.tree_util.tree_leaves(g)[0].ravel()[0]

timeit("render_train fwd+bwd", f_step_grad, params, occ, ro, rd)

# ---- finer attribution: full loss fwd+bwd (no optimizer), TV on/off ----
dyn100 = tr.dynamics(100)


def f_loss_grad(salt, params):
    def loss(p):
        l, _ = tr._loss_and_metrics(p, tr.state.render, key, images, poses,
                                    intr, None, dyn100, NR)
        return l + salt * 0.0
    l, g = jax.value_and_grad(loss)(params)
    return l + jax.tree_util.tree_leaves(g)[0].ravel()[0]

timeit("loss_and_metrics fwd+bwd", f_loss_grad, params)

_saved_tv = tr.cfg.lambda_tv
tr.cfg = dataclasses.replace(tr.cfg, lambda_tv=0.0)
timeit("loss_and_metrics fwd+bwd (TV off)", f_loss_grad, params)
tr.cfg = dataclasses.replace(tr.cfg, lambda_tv=_saved_tv)

# optimizer + EMA alone: apply a fixed grad tree through optax + the ramp
opt = tr.optimizer
ost = tr.state.opt_state
g_tree = jax.tree_util.tree_map(jnp.ones_like, params)


def f_opt(salt, params, ost):
    g = jax.tree_util.tree_map(lambda x: x + salt * 1e-9, g_tree)
    updates, ost2 = opt.update(g, ost, params)
    p2 = jax.tree_util.tree_map(lambda a, b: a + b, params, updates)
    ema = jax.tree_util.tree_map(lambda e, p: e * 0.95 + p * 0.05,
                                 tr.state.ema_params, p2)
    return (jax.tree_util.tree_leaves(p2)[0].ravel()[0]
            + jax.tree_util.tree_leaves(ema)[0].ravel()[0]
            + jax.tree_util.tree_leaves(ost2)[0].ravel()[0] * 0.0)

timeit("optax+EMA alone", f_opt, params, ost)

# pool compaction alone: nonzero(size=P) + the 3 scatters back to dense
flat_valid = jax.random.uniform(jax.random.PRNGKey(9),
                                (NR * rspec.num_fine,)) < 0.12


def f_pool(salt, fv):
    (ids,) = jnp.nonzero(fv, size=P, fill_value=fv.shape[0])
    vals = jnp.arange(P, dtype=jnp.float32) + salt
    dense = jnp.zeros((fv.shape[0],)).at[ids].set(vals, mode="drop")
    kept = jnp.zeros((fv.shape[0],)).at[ids].set(1.0, mode="drop")
    return dense.sum() + kept.sum()

timeit("pool nonzero+scatters", f_pool, flat_valid)

# the REAL step (losses + Adam + EMA + metrics), pipelined
for _ in range(2):
    state, m = fn(state, images, poses, intr, None, tr.dynamics(100))
float(m["loss"])
t0 = time.perf_counter(); K = 8
for i in range(K):
    state, m = fn(state, images, poses, intr, None, tr.dynamics(100 + i))
float(m["loss"])
print(f"full step_fn: {(time.perf_counter()-t0)/K*1e3:.1f} ms", flush=True)

# scan-chunked step (the shipped dispatch path): per-step inside scan
fn16 = tr.step_fn_for(NR, 16)
state, m = fn16(state, images, poses, intr, None, tr.dynamics(200))
float(m["loss"])
t0 = time.perf_counter()
for i in range(2):
    state, m = fn16(state, images, poses, intr, None, tr.dynamics(216 + 16 * i))
float(m["loss"])
print(f"scan16 step_fn: {(time.perf_counter()-t0)/32*1e3:.1f} ms/step",
      flush=True)
