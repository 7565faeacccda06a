import sys; sys.path.insert(0, "/root/repo")
"""Winsort vs gather routing for fine levels, on chip, 2^18 random points.

Times splat_encode_raw fwd and fwd+bwd with all fine levels routed to
(a) the plain gather path, (b) the stochastic 1-corner gather path,
(c) the window-sorted kernel path.  Random uniform points = worst case
(no locality, ~18% crossing corners).
"""
import time

import jax
import jax.numpy as jnp
import numpy as np

from nerf2mesh_tpu.ops.hashgrid import HashGridSpec, init_hashgrid
from nerf2mesh_tpu.ops import splat_encode as se

N = 1 << 18
spec = HashGridSpec(num_levels=16, level_dim=3, log2_hashmap_size=19,
                    desired_resolution=2048, layout="block512")
table = init_hashgrid(jax.random.PRNGKey(0), spec)
pts = jax.random.uniform(jax.random.PRNGKey(1), (N, 3))
# fine levels (resolution > 128) — what the trainer gather-routes
fine = tuple(l for l in range(16) if spec.resolutions[l] > 128)
print("fine levels:", fine, flush=True)
g = jax.random.normal(jax.random.PRNGKey(2), (N, spec.output_dim))


def timed(name, f, *args, K=8):
    jf = jax.jit(f)
    out = jf(*args)
    float(jax.tree_util.tree_leaves(out)[0].ravel()[0])
    t0 = time.perf_counter()
    for _ in range(K):
        out = jf(*args)
    float(jax.tree_util.tree_leaves(out)[0].ravel()[0])
    dt = (time.perf_counter() - t0) / K * 1e3
    print(f"{name}: {dt:.1f} ms", flush=True)
    return out


def mk(routing):
    def fwd(t, x):
        f, _ = se.splat_encode_raw(t, x, spec, resid_budget=1 << 17, **routing)
        return f

    def fb(t, x):
        def loss(tt):
            return jnp.sum(fwd(tt, x) * g)
        return jax.value_and_grad(loss)(t)
    return fwd, fb


for name, routing in [
        ("gather", dict(gather_levels=fine)),
        ("stochastic", dict(gather_levels=fine, stochastic=True)),
        ("winsort", dict(gather_levels=fine, winsort_levels=fine))]:
    fwd, fb = mk(routing)
    fa = timed(f"{name} fwd", fwd, table, pts)
    timed(f"{name} fwd+bwd", fb, table, pts)
    if name == "gather":
        ref = fa
    elif name == "winsort":
        err = float(jnp.max(jnp.abs(fa - ref)))
        print(f"winsort max|err| vs gather: {err:.2e}", flush=True)
