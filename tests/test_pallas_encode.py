"""Pallas sweep-encoder tests.

The kernel itself only runs on TPU (skipped under the CPU test mesh); the
manual backward is pure-XLA math and is gradient-checked here against the
reference hashgrid vjp.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from nerf2mesh_tpu.ops.hashgrid import (HashGridSpec, hashgrid_encode,
                                        init_hashgrid)
from nerf2mesh_tpu.ops.pallas_encode import (_sweep_bwd, pad_table,
                                             sweep_supported)


def test_sweep_supported_gate():
    assert sweep_supported(HashGridSpec(log2_hashmap_size=13))
    assert not sweep_supported(HashGridSpec(log2_hashmap_size=19))
    assert not sweep_supported(
        HashGridSpec(log2_hashmap_size=13, interpolation="smoothstep"))


def test_pad_table_layout():
    spec = HashGridSpec(num_levels=4, level_dim=2, desired_resolution=64,
                        log2_hashmap_size=12)
    table = init_hashgrid(jax.random.PRNGKey(0), spec)
    padded = pad_table(table, spec)
    S = 2 ** 12
    assert padded.shape == (4 * 2, S)
    # level 0 channel 0 prefix must equal the ragged slice
    np.testing.assert_allclose(
        np.asarray(padded[0, : int(spec.level_sizes[0])]),
        np.asarray(table[: int(spec.level_sizes[0]), 0]))


def test_manual_backward_matches_vjp(rng):
    spec = HashGridSpec(num_levels=6, level_dim=3, desired_resolution=128,
                        log2_hashmap_size=12)
    table = init_hashgrid(jax.random.PRNGKey(0), spec) * 100
    x = jnp.asarray(rng.uniform(0, 1, (64, 3)).astype(np.float32))
    g = jnp.asarray(rng.normal(size=(64, spec.output_dim)).astype(np.float32))
    _, vjp = jax.vjp(lambda t, xx: hashgrid_encode(t, xx, spec), table, x)
    dt_ref, dx_ref = vjp(g)
    dt, dx = _sweep_bwd(spec, (table, x), g)
    np.testing.assert_allclose(np.asarray(dt), np.asarray(dt_ref),
                               rtol=1e-4, atol=1e-4)
    np.testing.assert_allclose(np.asarray(dx), np.asarray(dx_ref),
                               rtol=1e-4, atol=1e-4)
