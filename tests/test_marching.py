"""Ray marching + compositing unit tests vs naive per-ray loops
(contract: raymarching.cu:332-489, 500-705)."""

import jax
import jax.numpy as jnp
import numpy as np

from nerf2mesh_tpu.ops.composite import composite_rays
from nerf2mesh_tpu.ops.marching import march_rays, near_far_from_aabb


def test_near_far_aabb():
    aabb = jnp.asarray([-1.0, -1, -1, 1, 1, 1])
    rays_o = jnp.asarray([[0.0, 0, 3], [0, 0, 3], [5, 5, 5]])
    rays_d = jnp.asarray([[0.0, 0, -1], [0, 1, 0], [0, 0, -1]])
    nears, fars = near_far_from_aabb(rays_o, rays_d, aabb, 0.05)
    np.testing.assert_allclose(nears[0], 2.0, atol=1e-5)
    np.testing.assert_allclose(fars[0], 4.0, atol=1e-5)
    # ray 1 and 2 miss the box -> empty interval
    assert float(fars[1]) <= float(nears[1]) + 1e-5
    assert float(fars[2]) <= float(nears[2]) + 1e-5


def test_march_full_occupancy_uniform_steps():
    H, cas = 32, 1
    occ = jnp.ones((cas, H, H, H), jnp.uint8)
    rays_o = jnp.asarray([[0.0, 0, 2.0]])
    rays_d = jnp.asarray([[0.0, 0, -1.0]])
    nears, fars = near_far_from_aabb(rays_o, rays_d,
                                     jnp.asarray([-1.0, -1, -1, 1, 1, 1]), 0.05)
    res = march_rays(rays_o, rays_d, occ, nears, fars,
                     num_points=1024, max_steps=256, grid_size=H,
                     cascades=cas, bound=1.0, dt_gamma=0.0)
    n = int(res.total)
    assert n > 0
    dt = 2 * np.sqrt(3) / 256
    # all samples on the single ray, t increasing by dt
    ts = np.asarray(res.ts)[:n]
    np.testing.assert_allclose(np.diff(ts), dt, atol=1e-4)
    assert np.all(np.asarray(res.ray_idx)[:n] == 0)
    # samples span [near, far]
    assert ts[0] >= float(nears[0])
    assert ts[-1] <= float(fars[0]) + 2 * dt
    # xyz = o + (t - dt) * d
    xyz = np.asarray(res.xyzs)[:n]
    expect = np.asarray(rays_o)[0] + (ts - dt)[:, None] * np.asarray(rays_d)[0]
    np.testing.assert_allclose(xyz, np.clip(expect, -1, 1), atol=1e-4)


def test_march_empty_occupancy():
    H = 16
    occ = jnp.zeros((1, H, H, H), jnp.uint8)
    rays_o = jnp.asarray([[0.0, 0, 2.0]])
    rays_d = jnp.asarray([[0.0, 0, -1.0]])
    nears, fars = near_far_from_aabb(rays_o, rays_d,
                                     jnp.asarray([-1.0, -1, -1, 1, 1, 1]), 0.05)
    res = march_rays(rays_o, rays_d, occ, nears, fars,
                     num_points=256, max_steps=64, grid_size=H,
                     cascades=1, bound=1.0)
    assert int(res.total) == 0
    assert not bool(np.any(np.asarray(res.valid)))


def test_march_half_occupancy_skips_empty():
    """Only the z<0 half of the box occupied -> samples only at z<0."""
    H = 32
    occ = np.zeros((1, H, H, H), np.uint8)
    occ[0, :, :, : H // 2] = 1  # z in [-1, 0)
    rays_o = jnp.asarray([[0.0, 0, 2.0]] * 3)
    rays_d = jnp.asarray([[0.0, 0, -1.0]] * 3)
    nears, fars = near_far_from_aabb(rays_o, rays_d,
                                     jnp.asarray([-1.0, -1, -1, 1, 1, 1]), 0.05)
    res = march_rays(rays_o, rays_d, jnp.asarray(occ), nears, fars,
                     num_points=2048, max_steps=256, grid_size=H,
                     cascades=1, bound=1.0)
    n = int(res.total)
    assert n > 0
    z = np.asarray(res.xyzs)[:n, 2]
    assert np.all(z <= 0 + 2 / H + 1e-3)


def naive_composite(sigmas, rgbs, ts, dts, offsets, counts, T_thresh=1e-4,
                    alpha_mode=False):
    N = len(offsets)
    image = np.zeros((N, 3)); depth = np.zeros(N); wsum = np.zeros(N)
    weights = np.zeros_like(sigmas)
    for n in range(N):
        T = 1.0
        for k in range(counts[n]):
            i = offsets[n] + k
            alpha = sigmas[i] if alpha_mode else 1 - np.exp(-sigmas[i] * dts[i])
            w = alpha * T
            weights[i] = w
            image[n] += w * rgbs[i]
            depth[n] += w * ts[i]
            wsum[n] += w
            T *= 1 - alpha
            if T < T_thresh:
                break
    return weights, wsum, depth, image


def test_composite_matches_naive(rng):
    N, P = 4, 64
    counts = np.array([20, 0, 30, 14])
    offsets = np.concatenate([[0], np.cumsum(counts)[:-1]])
    total = counts.sum()
    sigmas = rng.uniform(0, 50, P).astype(np.float32)
    rgbs = rng.uniform(0, 1, (P, 3)).astype(np.float32)
    ts = rng.uniform(1, 3, P).astype(np.float32)
    dts = np.full(P, 0.02, np.float32)
    ray_idx = np.zeros(P, np.int32)
    valid = np.zeros(P, bool)
    for n in range(N):
        ray_idx[offsets[n]:offsets[n] + counts[n]] = n
        valid[offsets[n]:offsets[n] + counts[n]] = True
    ray_idx[total:] = N - 1

    out = composite_rays(jnp.asarray(sigmas), jnp.asarray(rgbs), jnp.asarray(ts),
                         jnp.asarray(dts), jnp.asarray(ray_idx), jnp.asarray(valid),
                         num_rays=N)
    w, ws, d, img = naive_composite(sigmas, rgbs, ts, dts, offsets, counts)
    np.testing.assert_allclose(np.asarray(out["weights"]), w, rtol=1e-4, atol=1e-5)
    np.testing.assert_allclose(np.asarray(out["weights_sum"]), ws, rtol=1e-4, atol=1e-5)
    np.testing.assert_allclose(np.asarray(out["depth"]), d, rtol=1e-4, atol=1e-4)
    np.testing.assert_allclose(np.asarray(out["image"]), img, rtol=1e-4, atol=1e-4)


def test_composite_alpha_mode(rng):
    N, P = 2, 16
    counts = np.array([10, 6])
    offsets = np.array([0, 10])
    alphas = rng.uniform(0, 0.9, P).astype(np.float32)
    rgbs = rng.uniform(0, 1, (P, 3)).astype(np.float32)
    ts = np.linspace(1, 2, P).astype(np.float32)
    dts = np.full(P, 0.05, np.float32)
    ray_idx = np.array([0] * 10 + [1] * 6, np.int32)
    valid = np.ones(P, bool)
    out = composite_rays(jnp.asarray(alphas), jnp.asarray(rgbs), jnp.asarray(ts),
                         jnp.asarray(dts), jnp.asarray(ray_idx), jnp.asarray(valid),
                         num_rays=N, alpha_mode=True)
    w, ws, d, img = naive_composite(alphas, rgbs, ts, dts, offsets, counts,
                                    alpha_mode=True)
    np.testing.assert_allclose(np.asarray(out["weights_sum"]), ws, rtol=1e-4, atol=1e-5)
    np.testing.assert_allclose(np.asarray(out["image"]), img, rtol=1e-4, atol=1e-4)


def test_composite_grads_finite(rng):
    N, P = 2, 32
    sigmas = jnp.asarray(rng.uniform(0, 20, P).astype(np.float32))
    rgbs = jnp.asarray(rng.uniform(0, 1, (P, 3)).astype(np.float32))
    ts = jnp.asarray(np.linspace(1, 3, P).astype(np.float32))
    dts = jnp.full((P,), 0.02)
    ray_idx = jnp.asarray(np.repeat([0, 1], 16).astype(np.int32))
    valid = jnp.ones((P,), bool)

    def loss(s, r):
        out = composite_rays(s, r, ts, dts, ray_idx, valid, num_rays=N)
        return jnp.sum(out["image"] ** 2) + jnp.sum(out["weights_sum"])

    gs, gr = jax.grad(loss, argnums=(0, 1))(sigmas, rgbs)
    assert np.all(np.isfinite(np.asarray(gs)))
    assert np.all(np.isfinite(np.asarray(gr)))
    assert np.any(np.asarray(gs) != 0)
