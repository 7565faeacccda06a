import sys; sys.path.insert(0, "/root/repo")
"""Splat encoder on-chip: compile, exactness vs XLA path, fwd/bwd timing."""
import time
import jax, jax.numpy as jnp
import numpy as np
from nerf2mesh_tpu.ops.hashgrid import HashGridSpec, hashgrid_encode, init_hashgrid
from nerf2mesh_tpu.ops import splat_encode as se

spec = HashGridSpec(num_levels=16, level_dim=3, log2_hashmap_size=19,
                    desired_resolution=2048, layout="block512")
table = init_hashgrid(jax.random.PRNGKey(0), spec)
N = 2 ** 18
mode = sys.argv[1] if len(sys.argv) > 1 else "sorted"
GL = tuple(int(v) for v in sys.argv[2].split(",")) if len(sys.argv) > 2 else ()

key = jax.random.PRNGKey(1)
if mode == "clustered":
    # converged-occupancy proxy: points on a sphere surface + noise
    d = jax.random.normal(key, (N, 3))
    d = d / jnp.linalg.norm(d, axis=-1, keepdims=True)
    r = 0.35 + 0.01 * jax.random.normal(jax.random.PRNGKey(2), (N, 1))
    x = 0.5 + d * r
else:
    x = jax.random.uniform(key, (N, 3))
x = jnp.clip(x, 0.0, 1.0)

# morton sort by fine-block id (256^3 blocks)


def morton_sort(x):
    b = jnp.clip((x * 256).astype(jnp.int32), 0, 255)
    def spread(v):
        v = (v | (v << 16)) & 0x030000FF
        v = (v | (v << 8)) & 0x0300F00F
        v = (v | (v << 4)) & 0x030C30C3
        v = (v | (v << 2)) & 0x09249249
        return v
    key = spread(b[:, 0]) | (spread(b[:, 1]) << 1) | (spread(b[:, 2]) << 2)
    perm = jnp.argsort(key)
    return jnp.take(x, perm, axis=0)


xs = jax.jit(morton_sort)(x)

B = 1 << 18
fn = jax.jit(lambda t, p: se.splat_encode_raw(t, p, spec, resid_budget=B, gather_levels=GL))
t0 = time.perf_counter()
feat, cnt = fn(table, xs)
cntf = int(cnt.sum()); _ = float(feat[0, 0]); print("per-level resid:", [int(v) for v in cnt], flush=True)
print(f"compile+run: {time.perf_counter()-t0:.1f}s  resid={cntf} "
      f"({cntf/(N*16*8)*100:.2f}% of corners, budget {B})", flush=True)

# exactness vs XLA path on a slice
want = hashgrid_encode(table, xs[:4096], spec)
got = feat[:4096]
err = float(jnp.max(jnp.abs(got - want)))
print(f"max abs err vs hashgrid_encode: {err:.2e}", flush=True)

# timing: chain-state protocol (fetch a scalar per call)
K = 4
@jax.jit
def fwd_loop(salt, t, p):
    def body(i, acc):
        f, c = se.splat_encode_raw(t, p + salt * 1e-9, spec, resid_budget=B, gather_levels=GL)
        return acc + f[0, 0] + c.sum().astype(jnp.float32)
    return jax.lax.fori_loop(0, K, body, salt)

float(fwd_loop(jnp.float32(3), table, xs))
t0 = time.perf_counter()
float(fwd_loop(jnp.float32(1), table, xs))
dt = (time.perf_counter() - t0) / K
print(f"splat fwd: {dt*1e3:.1f} ms / {N} pts (XLA path: 947 ms)", flush=True)

@jax.jit
def both_loop(salt, t, p):
    def body(i, acc):
        def loss(tt):
            f, c = se.splat_encode_raw(tt, p + salt * 1e-9, spec, resid_budget=B, gather_levels=GL)
            return jnp.sum(f * (1.0 + p[:, :1] * 0)) * 1e-3, c
        (l, c), g = jax.value_and_grad(loss, has_aux=True)(t)
        return acc + l + g[::65537, 0].sum()
    return jax.lax.fori_loop(0, K, body, salt)

float(both_loop(jnp.float32(3), table, xs))
t0 = time.perf_counter()
float(both_loop(jnp.float32(1), table, xs))
dt = (time.perf_counter() - t0) / K
print(f"splat fwd+bwd: {dt*1e3:.1f} ms (XLA path: 1325 ms)", flush=True)
