"""Hash-grid encoder unit tests: vs a naive per-point reference, grad checks,
max_level masking, OOB behavior (contract: gridencoder.cu:87-244)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from nerf2mesh_tpu.ops.hashgrid import (
    HashGridSpec, hashgrid_encode, hashgrid_tv_loss, init_hashgrid,
)

PRIMES = (1, 2654435761, 805459861)


def naive_encode(table, x01, spec):
    """Straight-line numpy re-statement of the CUDA kernel semantics."""
    N = x01.shape[0]
    L, C, D = spec.num_levels, spec.level_dim, spec.input_dim
    out = np.zeros((N, L * C), np.float32)
    offsets = spec.offsets
    sizes = spec.level_sizes
    use_hash = spec.use_hash
    res = spec.resolutions
    for n in range(N):
        if np.any((x01[n] < 0) | (x01[n] > 1)):
            continue
        for l in range(L):
            scale = spec.level_scale(l)
            pos = x01[n] * scale + (0.0 if spec.align_corners else 0.5)
            pg = np.floor(pos).astype(np.int64)
            frac = pos - pg
            acc = np.zeros(C, np.float32)
            side = res[l] if spec.align_corners else res[l] + 1
            for corner in range(1 << D):
                w = 1.0
                coords = []
                for d in range(D):
                    if (corner >> d) & 1:
                        w *= frac[d]
                        coords.append(pg[d] + 1)
                    else:
                        w *= 1 - frac[d]
                        coords.append(pg[d])
                if use_hash[l]:
                    h = np.uint32(0)
                    for d in range(D):
                        h ^= np.uint32((coords[d] * PRIMES[d]) & 0xFFFFFFFF)
                    idx = int(h) % sizes[l]
                else:
                    idx = (coords[0] + coords[1] * side + coords[2] * side * side) % sizes[l]
                acc += w * np.asarray(table[offsets[l] + idx])
            out[n, l * C:(l + 1) * C] = acc
    return out


@pytest.mark.parametrize("level_dim", [1, 2])
def test_matches_naive(level_dim, rng):
    spec = HashGridSpec(num_levels=8, level_dim=level_dim,
                        desired_resolution=256, log2_hashmap_size=12)
    table = init_hashgrid(jax.random.PRNGKey(0), spec)
    x = rng.uniform(0, 1, size=(64, 3)).astype(np.float32)
    got = np.asarray(hashgrid_encode(table, jnp.asarray(x), spec))
    want = naive_encode(np.asarray(table), x, spec)
    np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-7)


def test_oob_zero(rng):
    spec = HashGridSpec(num_levels=4, level_dim=2, desired_resolution=64,
                        log2_hashmap_size=10)
    table = init_hashgrid(jax.random.PRNGKey(1), spec)
    x = np.array([[1.5, 0.5, 0.5], [-0.1, 0.2, 0.3]], np.float32)
    out = np.asarray(hashgrid_encode(table, jnp.asarray(x), spec))
    assert np.all(out == 0)


def test_max_level_masks(rng):
    spec = HashGridSpec(num_levels=8, level_dim=2, desired_resolution=128,
                        log2_hashmap_size=12)
    table = init_hashgrid(jax.random.PRNGKey(2), spec)
    x = jnp.asarray(rng.uniform(0.1, 0.9, size=(16, 3)).astype(np.float32))
    out = np.asarray(hashgrid_encode(table, x, spec, max_level=jnp.asarray(3)))
    C = spec.level_dim
    assert np.all(out[:, 3 * C:] == 0)
    assert np.any(out[:, : 3 * C] != 0)


def test_grad_wrt_table_finite_diff(rng):
    spec = HashGridSpec(num_levels=2, level_dim=1, base_resolution=4,
                        desired_resolution=8, log2_hashmap_size=6)
    table = init_hashgrid(jax.random.PRNGKey(3), spec) + 0.01
    x = jnp.asarray(rng.uniform(0.1, 0.9, size=(8, 3)).astype(np.float32))

    def loss(t):
        return jnp.sum(hashgrid_encode(t, x, spec) ** 2)

    g = jax.grad(loss)(table)
    # finite-difference check on a few entries
    eps = 1e-4
    tn = np.asarray(table)
    for (i, j) in [(0, 0), (5, 0), (17, 0)]:
        tp = tn.copy(); tp[i, j] += eps
        tm = tn.copy(); tm[i, j] -= eps
        fd = (loss(jnp.asarray(tp)) - loss(jnp.asarray(tm))) / (2 * eps)
        np.testing.assert_allclose(np.asarray(g)[i, j], fd, rtol=2e-2, atol=1e-4)


def test_grad_wrt_inputs(rng):
    """Input grads (needed for stage-1 offset training) are smooth inside cells."""
    spec = HashGridSpec(num_levels=4, level_dim=2, desired_resolution=64,
                        log2_hashmap_size=10)
    table = init_hashgrid(jax.random.PRNGKey(4), spec) * 100
    x = jnp.asarray(rng.uniform(0.3, 0.7, size=(4, 3)).astype(np.float32))

    def loss(xx):
        return jnp.sum(hashgrid_encode(table, xx, spec))

    g = jax.grad(loss)(x)
    assert np.all(np.isfinite(np.asarray(g)))
    assert np.any(np.asarray(g) != 0)


def test_tv_loss_positive_and_differentiable(rng):
    spec = HashGridSpec(num_levels=4, level_dim=1, desired_resolution=32,
                        log2_hashmap_size=10)
    table = init_hashgrid(jax.random.PRNGKey(5), spec) * 100
    x = jnp.asarray(rng.uniform(0, 1, size=(32, 3)).astype(np.float32))
    val, g = jax.value_and_grad(hashgrid_tv_loss)(table, x, spec)
    assert float(val) > 0
    assert np.all(np.isfinite(np.asarray(g)))
