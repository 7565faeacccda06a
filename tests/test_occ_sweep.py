"""Bit-packed occupancy sweep kernel vs the gather reference."""

import jax
import jax.numpy as jnp
import numpy as np

from nerf2mesh_tpu.ops.occ_sweep import (occ_lookup_sweep, pack_bits,
                                         sweep_supported)


def test_pack_bits_layout():
    occ = np.zeros((1, 32, 32, 32), np.uint8)
    occ[0, 3, 5, 7] = 1
    occ[0, 31, 31, 31] = 1
    words = np.asarray(pack_bits(jnp.asarray(occ)))
    n = (3 * 32 + 5) * 32 + 7
    assert (words.reshape(-1)[n // 32] >> (n % 32)) & 1
    n2 = 32 ** 3 - 1
    assert (np.uint32(words.reshape(-1)[n2 // 32]) >> (n2 % 32)) & 1
    assert int(np.sum([bin(np.uint32(w)).count("1")
                       for w in words.reshape(-1)])) == 2


def test_sweep_matches_gather():
    key = jax.random.PRNGKey(0)
    cas, H = 2, 32
    assert sweep_supported(cas, H)
    occ = (jax.random.uniform(key, (cas, H, H, H)) < 0.3).astype(jnp.uint8)
    idx = jax.random.randint(jax.random.PRNGKey(1), (5000,), 0, cas * H ** 3)
    got = occ_lookup_sweep(pack_bits(occ), idx, interpret=True)
    want = jnp.take(occ.reshape(-1), idx).astype(jnp.int32)
    np.testing.assert_array_equal(np.asarray(got), np.asarray(want))


def test_sweep_supported_sizes():
    assert sweep_supported(1, 128)
    assert sweep_supported(5, 128)
    assert sweep_supported(1, 32)
    assert not sweep_supported(1, 20)       # not word/lane aligned
