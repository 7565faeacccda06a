import sys; sys.path.insert(0, "/root/repo")
"""Per-level residual (out-of-window) rates: uniform vs clustered points."""
import jax, jax.numpy as jnp
import numpy as np
from nerf2mesh_tpu.ops.hashgrid import HashGridSpec
from nerf2mesh_tpu.ops import splat_encode as se

spec = HashGridSpec(num_levels=16, level_dim=3, log2_hashmap_size=19,
                    desired_resolution=2048, layout="block512")
N = 2 ** 18

def rates(x):
    x = jnp.clip(x, 0, 1)
    perm, _ = se.morton_perm(x)
    xs = jnp.take(x, perm, axis=0)
    tiles = xs.reshape(-1, se.TILE, 3)
    m = se.inwindow_mask(tiles, spec)          # [T,P,L,8]
    return 1.0 - jnp.mean(m.astype(jnp.float32), axis=(0, 1, 3))

key = jax.random.PRNGKey(0)
uni = jax.random.uniform(key, (N, 3))
d = jax.random.normal(key, (N, 3)); d /= jnp.linalg.norm(d, axis=-1, keepdims=True)
r = 0.35 + 0.01 * jax.random.normal(jax.random.PRNGKey(2), (N, 1))
sphere = 0.5 + d * r
# lego-ish: union of a few boxes/surfaces -> multi-scale structure
k3 = jax.random.PRNGKey(3)
parts = []
for i in range(8):
    c = jax.random.uniform(jax.random.fold_in(k3, i), (1, 3), minval=0.25, maxval=0.75)
    s = jax.random.uniform(jax.random.fold_in(k3, 100 + i), (1, 3), minval=0.02, maxval=0.15)
    parts.append(c + s * (jax.random.uniform(jax.random.fold_in(k3, 200 + i),
                                             (N // 8, 3)) - 0.5))
boxes = jnp.concatenate(parts, 0)

fn = jax.jit(rates)
for name, x in [("uniform", uni), ("sphere-shell", sphere), ("boxes", boxes)]:
    rr = np.asarray(fn(x))
    print(name, " ".join(f"{v:.2f}" for v in rr), flush=True)
