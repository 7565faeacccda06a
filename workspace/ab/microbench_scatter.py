import sys; sys.path.insert(0, "/root/repo")
"""Fine-level backward candidates: naive scatter-add vs sort+segment+unique."""
import time
import jax, jax.numpy as jnp

M = 2 ** 21          # corner touches per fine level (2^18 pts * 8)
S = 2 ** 19          # table entries per level
C = 3

key = jax.random.PRNGKey(0)
idx = jax.random.randint(key, (M,), 0, S)
g = jax.random.normal(jax.random.PRNGKey(1), (M, C))


def timeit(name, fn, *args):
    K = 4
    @jax.jit
    def loop(salt, *a):
        def body(i, acc):
            r = fn(*a, salt + jnp.float32(i) * 1e-9)
            return acc + r
        return jax.lax.fori_loop(0, K, body, salt)
    float(loop(jnp.float32(3), *args))
    t0 = time.perf_counter()
    float(loop(jnp.float32(1), *args))
    dt = (time.perf_counter() - t0) / K
    print(f"{name}: {dt*1e3:.1f} ms", flush=True)


def naive(idx, g, salt):
    out = jnp.zeros((S, C)).at[idx].add(g + salt)
    return out[0, 0]


def naive_w1(idx, g, salt):
    acc = jnp.float32(0)
    for c in range(C):
        out = jnp.zeros((S,)).at[idx].add(g[:, c] + salt)
        acc = acc + out[0]
    return acc


def sort_segment(idx, g, salt):
    gs = g + salt
    si, p = jax.lax.sort_key_val(idx, jnp.arange(M, dtype=jnp.int32))
    gp = jnp.take(gs, p, axis=0)                     # [M, C] permuted
    cs = jnp.cumsum(gp, axis=0)
    last = jnp.concatenate([si[1:] != si[:-1], jnp.array([True])])
    # cumsum value at each segment end minus previous segment end
    seg_end = jnp.where(last[:, None], cs, 0.0)
    # gather previous segment end via exclusive trick: scatter segment sums
    (ends,) = jnp.nonzero(last, size=M, fill_value=M - 1)
    sums = jnp.take(cs, ends, axis=0)
    sums = jnp.concatenate([sums[:1], sums[1:] - sums[:-1]], axis=0)
    uidx = jnp.take(si, ends)
    valid = jnp.arange(M) < jnp.sum(last)
    out = jnp.zeros((S, C)).at[uidx].add(
        jnp.where(valid[:, None], sums, 0.0))
    return out[0, 0] + seg_end[0, 0]


timeit("naive scatter W=3", naive, idx, g)
timeit("naive scatter 3x W=1", naive_w1, idx, g)
timeit("sort+segment+unique", sort_segment, idx, g)
