import sys; sys.path.insert(0, "/root/repo")
"""Direct encode cost at TRAINER config, hoist-proof (salts the TABLE too),
on REAL pool positions; also fetches the kernel-level residual count vs the
budget to see whether the lax.cond full-gather fallback is live."""
import dataclasses, os, time
import jax, jax.numpy as jnp
import numpy as np
from nerf2mesh_tpu.config import Config
from nerf2mesh_tpu.data.provider import load_nerf_dataset
from nerf2mesh_tpu.data.synthetic import generate_synthetic_dataset
from nerf2mesh_tpu.utils.trainer import Trainer
from nerf2mesh_tpu.models.renderer import render_train
from nerf2mesh_tpu.ops.splat_encode import splat_encode

root = "/tmp/bench_scene"
cfg = dataclasses.replace(
    Config(path=root), bound=1.0, scale=0.8, dt_gamma=0.0, iters=30000,
    num_rays=32768, num_points=2**18, max_steps=1024, grid_size=128,
    diffuse_step=100, random_image_batch=True,
    mark_untrained=True, workspace="/tmp/tail_ws3").finalize()
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
nspec = tr.net_spec
gl = nspec.encode_gather_levels
print("routing:", gl, " budget:", nspec.encode_resid_budget, flush=True)

# real pool positions from one render
rspec = tr.render_spec
key = jax.random.PRNGKey(0)
import nerf2mesh_tpu.data.rays as rays_mod
# rays from a real camera
H, W = ds.H, ds.W
ro, rd = rays_mod.get_rays(np.asarray(ds.poses[0]), ds.intrinsics_for(0),
                           H, W)
sel = np.random.default_rng(0).integers(0, H * W, 32768)
ro = jnp.asarray(ro.reshape(-1, 3)[sel]); rd = jnp.asarray(rd.reshape(-1, 3)[sel])
out = jax.jit(lambda p, occ, ro, rd: render_train(
    p, occ, ro, rd, jnp.ones((3,)), jax.random.PRNGKey(1), rspec, nspec,
    shading="full", perturb=True,
    aabb=jnp.asarray(tr._aabb), pool_size=tr.pool_size))(
        tr.state.params, tr.state.render.occ_grid, ro, rd)
xp = jax.lax.stop_gradient(out["xyzs"])      # [P, 3] pooled, REAL distribution
x01 = (xp + nspec.bound) / (2 * nspec.bound)
print("pool:", x01.shape, " valid:", int(out['pp_valid'].sum()), flush=True)

gspec = nspec.density_grid_spec
table = tr.state.params["table"]

# residual count vs budget (the cond predicate)
_, cnt = jax.jit(lambda t, x: splat_encode(
    t, x, gspec, resid_budget=nspec.encode_resid_budget,
    gather_levels=gl, stochastic=True))(table, x01)
cnt = np.asarray(cnt)
kmask = np.array([l not in gl for l in range(gspec.num_levels)])
print("resid counts per level:", cnt.tolist(), flush=True)
print("kernel-level resid TOTAL:", int(cnt[kmask].sum()),
      " budget:", nspec.encode_resid_budget, flush=True)


def timed(tag, f, K=4):
    t2 = table
    float(f(t2, x01))
    t0 = time.perf_counter()
    for i in range(K):
        t2 = t2 * (1.0 + 1e-9)      # param-varying: nothing hoistable/cached
        r = float(f(t2, x01))
    print(f"{tag}: {(time.perf_counter()-t0)/K*1e3:.1f} ms", flush=True)


B = nspec.encode_resid_budget
for tag, budget in (("budget=2^19", B), ("budget=2^21", 1 << 21)):
    @jax.jit
    def enc_g(t, x, budget=budget):
        def loss(tt):
            return jnp.sum(splat_encode(tt, x, gspec, resid_budget=budget,
                                        gather_levels=gl, stochastic=True)[0])
        l, g = jax.value_and_grad(loss)(t)
        return l + g.ravel()[0]
    timed(f"encode fwd+bwd real-pool {tag}", enc_g)
