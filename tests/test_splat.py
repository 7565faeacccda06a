"""Splat-contraction encoder: layout + exactness vs hashgrid_encode."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from nerf2mesh_tpu.ops.hashgrid import (HashGridSpec, hashgrid_encode,
                                        init_hashgrid, _corner_indices,
                                        _corner_offsets)
from nerf2mesh_tpu.ops import splat_encode as se


def small_spec(**kw):
    kw.setdefault("num_levels", 6)
    kw.setdefault("level_dim", 3)
    kw.setdefault("log2_hashmap_size", 13)
    kw.setdefault("desired_resolution", 256)
    return HashGridSpec(layout="block512", **kw)


def test_splat_layout_roundtrip():
    spec = small_spec()
    table = init_hashgrid(jax.random.PRNGKey(0), spec)
    splat = se.to_splat(table, spec)
    assert splat.shape == (int(se.window_counts(spec).sum()), 24, 64)
    back = se.from_splat(splat, spec)
    np.testing.assert_array_equal(np.asarray(back), np.asarray(table))


def test_splat_layout_indexing():
    """splat[woff+win, c*8+x, 8z+y] == table[off + win*512 + x+8y+64z, c]."""
    spec = small_spec()
    table = init_hashgrid(jax.random.PRNGKey(0), spec)
    splat = np.asarray(se.to_splat(table, spec))
    tab = np.asarray(table)
    offs = spec.offsets
    woffs = se.window_offsets(spec)
    rng = np.random.default_rng(0)
    for l in [0, 3, 5]:
        n_win = int(se.window_counts(spec)[l])
        for _ in range(20):
            win = rng.integers(n_win)
            x, y, z, c = rng.integers(8), rng.integers(8), rng.integers(8), rng.integers(3)
            a = splat[woffs[l] + win, c * 8 + x, 8 * z + y]
            b = tab[offs[l] + win * 512 + x + 8 * y + 64 * z, c]
            assert a == b


def _residual_feat(table, x_tiles, spec):
    """Out-of-window corner contributions via the canonical gather."""
    T, P, _ = x_tiles.shape
    L, C = spec.num_levels, spec.level_dim
    x = x_tiles.reshape(-1, 3).astype(jnp.float32)
    scales = jnp.asarray([spec.level_scale(l) for l in range(L)], jnp.float32)
    shift = 0.0 if spec.align_corners else 0.5
    pos = x[:, None, :] * scales[None, :, None] + shift
    pg = jnp.floor(pos)
    frac = pos - pg
    corners = _corner_offsets(3)
    cg = pg.astype(jnp.uint32)[:, :, None, :] + jnp.asarray(corners)[None, None]
    idx = _corner_indices(cg, spec)                                  # [N,L,8]
    cm = jnp.asarray(corners.astype(np.float32))
    w = jnp.prod(cm[None, None] * frac[:, :, None, :]
                 + (1 - cm[None, None]) * (1 - frac[:, :, None, :]), -1)
    inw = se.inwindow_mask(x_tiles, spec).reshape(-1, L, 8)
    w = jnp.where(inw, 0.0, w)
    feat = jnp.zeros((x.shape[0], L, C))
    for c in range(C):
        v = jnp.take(table[:, c], idx.reshape(-1), axis=0).reshape(-1, L, 8)
        feat = feat.at[:, :, c].set(jnp.sum(w * v, -1))
    return feat.reshape(T, P, L, C)


@pytest.mark.parametrize("local", [True, False])
def test_window_plus_residual_equals_canonical(local):
    """kernel-math (XLA oracle) + residual == hashgrid_encode, whether or not
    points are spatially local."""
    spec = small_spec()
    key = jax.random.PRNGKey(1)
    table = init_hashgrid(key, spec)
    T, P = 4, se.TILE
    if local:
        # tight clusters -> most corners in-window
        centers = jax.random.uniform(key, (T, 1, 3), minval=0.1, maxval=0.9)
        pts = centers + jax.random.uniform(
            jax.random.PRNGKey(2), (T, P, 3), minval=0, maxval=0.02)
    else:
        pts = jax.random.uniform(key, (T, P, 3))
    pts = jnp.clip(pts, 0.0, 1.0)

    inw = se.windowed_reference(table, pts, spec)                    # [T,P,L,C]
    res = _residual_feat(table, pts, spec)
    got = (inw + res).reshape(T * P, -1)

    want = hashgrid_encode(table, pts.reshape(-1, 3), spec)
    L, C = spec.num_levels, spec.level_dim
    want = want.reshape(T * P, L, C).reshape(T * P, -1)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               atol=2e-6, rtol=1e-5)
    if local:
        # sanity: locality actually put most corners in-window
        frac_in = float(se.inwindow_mask(pts, spec).mean())
        assert frac_in > 0.9


def _mixed_points(key, T, P):
    """Half the tiles local clusters, half fully random."""
    k1, k2, k3 = jax.random.split(key, 3)
    centers = jax.random.uniform(k1, (T // 2, 1, 3), minval=0.1, maxval=0.9)
    local = centers + jax.random.uniform(k2, (T // 2, P, 3),
                                         minval=0, maxval=0.03)
    rnd = jax.random.uniform(k3, (T - T // 2, P, 3))
    return jnp.clip(jnp.concatenate([local, rnd], 0), 0, 1).reshape(-1, 3)


def test_splat_kernel_forward_exact():
    """Pallas fwd (interpret) + residual == hashgrid_encode."""
    spec = small_spec()
    table = init_hashgrid(jax.random.PRNGKey(0), spec)
    pts = _mixed_points(jax.random.PRNGKey(1), 4, se.TILE)
    feat, cnt = se.splat_encode_raw(table, pts, spec,
                                    resid_budget=1 << 15, interpret=True)
    want = hashgrid_encode(table, pts, spec)
    assert int(cnt.sum()) < (1 << 15)
    np.testing.assert_allclose(np.asarray(feat), np.asarray(want),
                               atol=2e-6, rtol=1e-5)


def test_splat_kernel_oob_zero():
    spec = small_spec()
    table = init_hashgrid(jax.random.PRNGKey(0), spec)
    pts = np.array(_mixed_points(jax.random.PRNGKey(1), 2, se.TILE))
    pts[7] = [1.7, 0.3, 0.2]
    pts[200] = [-0.1, 0.5, 0.5]
    feat, _ = se.splat_encode_raw(table, jnp.asarray(pts), spec,
                                  resid_budget=1 << 15, interpret=True)
    assert np.all(np.asarray(feat[7]) == 0)
    assert np.all(np.asarray(feat[200]) == 0)


def test_splat_kernel_table_grads():
    """d(table) through the Pallas bwd kernel + residual == XLA autodiff."""
    spec = small_spec()
    table = init_hashgrid(jax.random.PRNGKey(0), spec)
    pts = _mixed_points(jax.random.PRNGKey(2), 4, se.TILE)
    g = jax.random.normal(jax.random.PRNGKey(3),
                          (pts.shape[0], spec.output_dim))

    def loss_splat(t):
        f, _ = se.splat_encode_raw(t, pts, spec, resid_budget=1 << 15,
                                   interpret=True)
        return jnp.sum(f * g)

    def loss_ref(t):
        return jnp.sum(hashgrid_encode(t, pts, spec) * g)

    d_s = jax.grad(loss_splat)(table)
    d_r = jax.grad(loss_ref)(table)
    np.testing.assert_allclose(np.asarray(d_s), np.asarray(d_r),
                               atol=1e-4, rtol=1e-4)


def test_splat_public_sorted_padded():
    """splat_encode: arbitrary N, internal morton sort + unsort, exact."""
    spec = small_spec()
    table = init_hashgrid(jax.random.PRNGKey(0), spec)
    pts = jax.random.uniform(jax.random.PRNGKey(5), (777, 3))
    feat, _ = se.splat_encode(table, pts, spec, resid_budget=1 << 15,
                              interpret=True)
    want = hashgrid_encode(table, pts, spec)
    np.testing.assert_allclose(np.asarray(feat), np.asarray(want),
                               atol=2e-6, rtol=1e-5)


def test_splat_overflow_falls_back_exactly():
    """Past-budget inputs take the full-gather branch — still exact."""
    spec = small_spec()
    table = init_hashgrid(jax.random.PRNGKey(0), spec)
    pts = jax.random.uniform(jax.random.PRNGKey(6), (2 * se.TILE, 3))
    feat, cnt = se.splat_encode(table, pts, spec, resid_budget=8,
                                interpret=True)
    assert int(cnt.sum()) > 8
    want = hashgrid_encode(table, pts, spec)
    np.testing.assert_allclose(np.asarray(feat), np.asarray(want),
                               atol=2e-6, rtol=1e-5)

    g = jax.random.normal(jax.random.PRNGKey(7), feat.shape)
    d_s = jax.grad(lambda t: jnp.sum(se.splat_encode(
        t, pts, spec, resid_budget=8, interpret=True)[0] * g))(table)
    d_r = jax.grad(lambda t: jnp.sum(hashgrid_encode(t, pts, spec) * g))(table)
    np.testing.assert_allclose(np.asarray(d_s), np.asarray(d_r),
                               atol=1e-4, rtol=1e-4)


def test_splat_budget_overflow_is_counted():
    spec = small_spec()
    table = init_hashgrid(jax.random.PRNGKey(0), spec)
    pts = jnp.clip(jax.random.uniform(jax.random.PRNGKey(1),
                                      (2 * se.TILE, 3)), 0, 1)
    _, cnt = se.splat_encode_raw(table, pts, spec, resid_budget=64,
                                 interpret=True)
    assert cnt.shape == (spec.num_levels,)
    assert int(cnt.sum()) > 64  # random points overflow a tiny budget, loudly


@pytest.mark.parametrize("gl", [(4, 5), tuple(range(6))])
def test_splat_per_level_routing(gl):
    """gather_levels routing stays exact (values and table grads)."""
    spec = small_spec()
    table = init_hashgrid(jax.random.PRNGKey(0), spec)
    pts = _mixed_points(jax.random.PRNGKey(9), 4, se.TILE)
    g = jax.random.normal(jax.random.PRNGKey(10),
                          (pts.shape[0], spec.output_dim))

    feat, cnt = se.splat_encode_raw(table, pts, spec, resid_budget=1 << 15,
                                    gather_levels=gl, interpret=True)
    want = hashgrid_encode(table, pts, spec)
    np.testing.assert_allclose(np.asarray(feat), np.asarray(want),
                               atol=2e-6, rtol=1e-5)

    d_s = jax.grad(lambda t: jnp.sum(se.splat_encode_raw(
        t, pts, spec, resid_budget=1 << 15, gather_levels=gl,
        interpret=True)[0] * g))(table)
    d_r = jax.grad(lambda t: jnp.sum(hashgrid_encode(t, pts, spec) * g))(table)
    np.testing.assert_allclose(np.asarray(d_s), np.asarray(d_r),
                               atol=1e-4, rtol=1e-4)


def test_splat_stochastic_unbiased_and_bounded():
    """stochastic=True: 1-corner sampling on gather levels is an unbiased
    estimate of trilinear interpolation (mean over a jittered point cloud
    matches the exact encode) and every sample lies within the convex hull
    of its level's corner values."""
    spec = small_spec()
    table = init_hashgrid(jax.random.PRNGKey(0), spec)
    gl = (3, 4, 5)

    # cloud of N jitters around one location: position-hash randomness
    # decorrelates corner picks across the cloud
    N = 16 * se.TILE
    base = jnp.asarray([[0.412, 0.633, 0.287]])
    pts = jnp.clip(
        base + jax.random.uniform(jax.random.PRNGKey(2), (N, 3),
                                  minval=0, maxval=2e-4), 0, 1)

    exact, _ = se.splat_encode_raw(table, pts, spec, resid_budget=1 << 15,
                                   gather_levels=gl, interpret=True)
    sto, _ = se.splat_encode_raw(table, pts, spec, resid_budget=1 << 15,
                                 gather_levels=gl, stochastic=True,
                                 interpret=True)
    exact = np.asarray(exact).reshape(N, spec.num_levels, spec.level_dim)
    sto = np.asarray(sto).reshape(N, spec.num_levels, spec.level_dim)

    # kernel-routed levels: in-window part exact, residual part a 1-corner
    # unbiased estimate — cloud means must agree (and coarse level 0, whose
    # cells dwarf the jitter, has no residual at this location: exact)
    np.testing.assert_allclose(sto[:, 0], exact[:, 0], atol=2e-6, rtol=1e-5)
    for l in range(3):
        scale = np.abs(exact[:, l]).mean() + 1e-8
        np.testing.assert_allclose(sto[:, l].mean(0) / scale,
                                   exact[:, l].mean(0) / scale, atol=0.15)

    for l in gl:
        # unbiased: cloud means agree (feature values vary ~sigma(init)=1e-4
        # scale; the standard error over 2048 samples is well below 10%)
        m_exact = exact[:, l].mean(0)
        m_sto = sto[:, l].mean(0)
        scale = np.abs(exact[:, l]).mean() + 1e-8
        np.testing.assert_allclose(m_sto / scale, m_exact / scale, atol=0.15)
        # corner picks actually vary across the cloud
        assert np.unique(np.round(sto[:, l], 8), axis=0).shape[0] > 4

    # gradient flows only to sampled corners, scaled by total weight:
    # sum over the table of d(sum feat)/d(table) equals N per (level, chan)
    # for both modes (weights sum to 1)
    g = jnp.ones((N, spec.output_dim))
    d = jax.grad(lambda t: jnp.sum(se.splat_encode_raw(
        t, pts, spec, resid_budget=1 << 15, gather_levels=gl,
        stochastic=True, interpret=True)[0] * g))(table)
    d = np.asarray(d)
    # holds for gather levels (1-corner estimator) AND kernel levels
    # (in-window kernel bwd + stochastic residual): weights sum to 1
    for l in list(gl) + [1, 2]:
        lo, hi = spec.offsets[l], spec.offsets[l + 1]
        np.testing.assert_allclose(d[lo:hi].sum(), N * spec.level_dim,
                                   rtol=1e-4)


# ---------------------------------------------------------------------------
# window-sorted fine-level path
# ---------------------------------------------------------------------------

def test_winsort_forward_exact():
    """Winsort kernel + crossing residual == hashgrid_encode, for RANDOM
    (no spatial locality) points — the fine-level regime it exists for."""
    spec = small_spec()
    table = init_hashgrid(jax.random.PRNGKey(0), spec)
    pts = jax.random.uniform(jax.random.PRNGKey(1), (4 * se.TILE, 3))
    wl = (3, 4, 5)
    feat, _ = se.splat_encode_raw(table, pts, spec, resid_budget=1 << 15,
                                  gather_levels=wl, winsort_levels=wl,
                                  interpret=True)
    want = hashgrid_encode(table, pts, spec)
    np.testing.assert_allclose(np.asarray(feat), np.asarray(want),
                               atol=2e-6, rtol=1e-5)


def test_winsort_oob_and_grads():
    spec = small_spec()
    table = init_hashgrid(jax.random.PRNGKey(0), spec)
    pts = np.array(jax.random.uniform(jax.random.PRNGKey(2),
                                      (2 * se.TILE, 3)))
    pts[5] = [1.3, 0.5, 0.5]
    pts[190] = [0.5, -0.2, 0.5]
    pts = jnp.asarray(pts)
    wl = (4, 5)
    g = jax.random.normal(jax.random.PRNGKey(3),
                          (pts.shape[0], spec.output_dim))

    def loss_ws(t):
        f, _ = se.splat_encode_raw(t, pts, spec, resid_budget=1 << 15,
                                   gather_levels=wl, winsort_levels=wl,
                                   interpret=True)
        return jnp.sum(f * g), f

    (l_ws, f_ws), d_ws = jax.value_and_grad(loss_ws, has_aux=True)(table)
    assert np.all(np.asarray(f_ws[5]) == 0)
    assert np.all(np.asarray(f_ws[190]) == 0)
    d_ref = jax.grad(lambda t: jnp.sum(hashgrid_encode(t, pts, spec) * g))(
        table)
    np.testing.assert_allclose(np.asarray(d_ws), np.asarray(d_ref),
                               atol=1e-4, rtol=1e-4)


def test_winsort_residual_overflow_falls_back_exactly():
    """ws_count > budget -> lax.cond full-gather branch, still exact."""
    spec = small_spec()
    table = init_hashgrid(jax.random.PRNGKey(0), spec)
    pts = jax.random.uniform(jax.random.PRNGKey(4), (2 * se.TILE, 3))
    wl = tuple(range(spec.num_levels))      # every level winsort: huge resid

    feat, _ = se.splat_encode_raw(table, pts, spec, resid_budget=1,
                                  gather_levels=wl, winsort_levels=wl,
                                  winsort_budget=128, interpret=True)
    want = hashgrid_encode(table, pts, spec)
    np.testing.assert_allclose(np.asarray(feat), np.asarray(want),
                               atol=2e-6, rtol=1e-5)
