"""Dense occupancy-importance sampling + compositing tests
(behavioral contract: raymarching.cu:332-489, 500-705)."""

import jax
import jax.numpy as jnp
import numpy as np

from nerf2mesh_tpu.ops.composite import composite_rays
from nerf2mesh_tpu.ops.sampling import near_far_from_aabb, sample_rays


def test_near_far_aabb():
    aabb = jnp.asarray([-1.0, -1, -1, 1, 1, 1])
    rays_o = jnp.asarray([[0.0, 0, 3], [0, 0, 3], [5, 5, 5]])
    rays_d = jnp.asarray([[0.0, 0, -1], [0, 1, 0], [0, 0, -1]])
    nears, fars = near_far_from_aabb(rays_o, rays_d, aabb, 0.05)
    np.testing.assert_allclose(nears[0], 2.0, atol=1e-5)
    np.testing.assert_allclose(fars[0], 4.0, atol=1e-5)
    assert float(fars[1]) <= float(nears[1]) + 1e-5
    assert float(fars[2]) <= float(nears[2]) + 1e-5


def _axis_ray():
    rays_o = jnp.asarray([[0.0, 0, 2.0]])
    rays_d = jnp.asarray([[0.0, 0, -1.0]])
    nears, fars = near_far_from_aabb(
        rays_o, rays_d, jnp.asarray([-1.0, -1, -1, 1, 1, 1]), 0.05)
    return rays_o, rays_d, nears, fars


def test_full_occupancy_uniform():
    H = 32
    occ = jnp.ones((1, H, H, H), jnp.uint8)
    ro, rd, nears, fars = _axis_ray()
    m = sample_rays(ro, rd, occ, nears, fars, num_coarse=64, num_fine=32,
                    grid_size=H, cascades=1, bound=1.0, dt_gamma=0.0)
    assert int(m.total) == 32
    ts = np.asarray(m.ts[0])
    # samples uniform over [near, far], increasing
    assert np.all(np.diff(ts) > 0)
    assert ts[0] >= float(nears[0]) - 1e-4
    assert ts[-1] <= float(fars[0]) + 1e-4
    # dt = occupied length / num_fine
    np.testing.assert_allclose(np.asarray(m.dts[0]),
                               (float(fars[0]) - float(nears[0])) / 32, rtol=1e-3)
    # xyz on the ray
    np.testing.assert_allclose(
        np.asarray(m.xyzs[0]),
        np.asarray(ro)[0] + ts[:, None] * np.asarray(rd)[0], atol=1e-4)


def test_empty_occupancy():
    H = 16
    occ = jnp.zeros((1, H, H, H), jnp.uint8)
    ro, rd, nears, fars = _axis_ray()
    m = sample_rays(ro, rd, occ, nears, fars, num_coarse=64, num_fine=32,
                    grid_size=H, cascades=1, bound=1.0)
    assert int(m.total) == 0


def test_half_occupancy_concentrates_samples():
    H = 32
    occ = np.zeros((1, H, H, H), np.uint8)
    occ[0, :, :, : H // 2] = 1          # z in [-1, 0)
    ro, rd, nears, fars = _axis_ray()
    m = sample_rays(ro, rd, jnp.asarray(occ), nears, fars,
                    num_coarse=128, num_fine=32, grid_size=H, cascades=1,
                    bound=1.0)
    assert int(m.total) == 32
    z = np.asarray(m.xyzs[0, :, 2])
    assert np.all(z <= 2 / H + 1e-3)     # all samples in occupied half
    # sample density doubled vs full occupancy (same count, half the length)
    np.testing.assert_allclose(np.asarray(m.dts[0]).mean(), 1.0 / 32, rtol=0.15)


def naive_composite_dense(sigmas, rgbs, ts, dts, valid, T_thresh=1e-4,
                          alpha_mode=False):
    N, K = sigmas.shape
    image = np.zeros((N, 3)); depth = np.zeros(N); wsum = np.zeros(N)
    weights = np.zeros_like(sigmas)
    for n in range(N):
        T = 1.0
        for k in range(K):
            if not valid[n, k]:
                continue
            alpha = sigmas[n, k] if alpha_mode else 1 - np.exp(-sigmas[n, k] * dts[n, k])
            if T < T_thresh:
                break
            w = alpha * T
            weights[n, k] = w
            image[n] += w * rgbs[n, k]
            depth[n] += w * ts[n, k]
            wsum[n] += w
            T *= 1 - alpha
    return weights, wsum, depth, image


def test_composite_matches_naive(rng):
    N, K = 4, 32
    sigmas = rng.uniform(0, 50, (N, K)).astype(np.float32)
    rgbs = rng.uniform(0, 1, (N, K, 3)).astype(np.float32)
    ts = np.sort(rng.uniform(1, 3, (N, K)).astype(np.float32), axis=-1)
    dts = np.full((N, K), 0.02, np.float32)
    valid = rng.uniform(size=(N, K)) > 0.3
    valid[1] = False
    out = composite_rays(jnp.asarray(sigmas), jnp.asarray(rgbs),
                         jnp.asarray(ts), jnp.asarray(dts), jnp.asarray(valid))
    w, ws, d, img = naive_composite_dense(sigmas, rgbs, ts, dts, valid)
    np.testing.assert_allclose(np.asarray(out["weights"]), w, rtol=1e-4, atol=1e-5)
    np.testing.assert_allclose(np.asarray(out["weights_sum"]), ws, rtol=1e-4, atol=1e-5)
    np.testing.assert_allclose(np.asarray(out["depth"]), d, rtol=1e-4, atol=1e-4)
    np.testing.assert_allclose(np.asarray(out["image"]), img, rtol=1e-4, atol=1e-4)


def test_composite_alpha_mode(rng):
    N, K = 2, 16
    alphas = rng.uniform(0, 0.9, (N, K)).astype(np.float32)
    rgbs = rng.uniform(0, 1, (N, K, 3)).astype(np.float32)
    ts = np.tile(np.linspace(1, 2, K, dtype=np.float32), (N, 1))
    dts = np.full((N, K), 0.05, np.float32)
    valid = np.ones((N, K), bool)
    out = composite_rays(jnp.asarray(alphas), jnp.asarray(rgbs), jnp.asarray(ts),
                         jnp.asarray(dts), jnp.asarray(valid), alpha_mode=True)
    w, ws, d, img = naive_composite_dense(alphas, rgbs, ts, dts, valid,
                                          alpha_mode=True)
    np.testing.assert_allclose(np.asarray(out["weights_sum"]), ws, rtol=1e-4, atol=1e-5)
    np.testing.assert_allclose(np.asarray(out["image"]), img, rtol=1e-4, atol=1e-4)


def test_composite_grads_finite(rng):
    N, K = 2, 16
    sigmas = jnp.asarray(rng.uniform(0, 20, (N, K)).astype(np.float32))
    rgbs = jnp.asarray(rng.uniform(0, 1, (N, K, 3)).astype(np.float32))
    ts = jnp.asarray(np.tile(np.linspace(1, 3, K, dtype=np.float32), (N, 1)))
    dts = jnp.full((N, K), 0.02)
    valid = jnp.ones((N, K), bool)

    def loss(s, r):
        out = composite_rays(s, r, ts, dts, valid)
        return jnp.sum(out["image"] ** 2) + jnp.sum(out["weights_sum"])

    gs, gr = jax.grad(loss, argnums=(0, 1))(sigmas, rgbs)
    assert np.all(np.isfinite(np.asarray(gs)))
    assert np.all(np.isfinite(np.asarray(gr)))
    assert np.any(np.asarray(gs) != 0)


def test_segment_mode_composes_to_full_march():
    """sample_rays segment mode (early-exit eval): two sequential K/2-sample
    segments at fixed spacing must reproduce the sample positions of one
    K-sample fixed-spacing call, and t_exit must advance exactly by the
    consumed occupied length."""
    H = 32
    occ = jnp.ones((1, H, H, H), jnp.uint8)
    ro, rd, nears, fars = _axis_ray()
    span = float(fars[0] - nears[0])
    sd = jnp.asarray([span / 32], jnp.float32)

    full = sample_rays(ro, rd, occ, nears, fars, num_coarse=64, num_fine=32,
                       grid_size=H, cascades=1, bound=1.0, sample_dt=sd)
    assert int(full.total) == 32
    # exhausted the ray: t_exit signals done
    assert float(full.t_exit[0]) > float(fars[0])

    seg1 = sample_rays(ro, rd, occ, nears, fars, num_coarse=64, num_fine=16,
                       grid_size=H, cascades=1, bound=1.0, sample_dt=sd)
    assert int(seg1.total) == 16
    t1 = float(seg1.t_exit[0])
    np.testing.assert_allclose(t1, float(nears[0]) + 16 * float(sd[0]),
                               rtol=1e-4)
    seg2 = sample_rays(ro, rd, occ, jnp.asarray([t1]), fars, num_coarse=64,
                       num_fine=16, grid_size=H, cascades=1, bound=1.0,
                       sample_dt=sd)
    assert int(seg2.total) == 16

    ts_full = np.asarray(full.ts[0])
    ts_seg = np.concatenate([np.asarray(seg1.ts[0]), np.asarray(seg2.ts[0])])
    np.testing.assert_allclose(ts_seg, ts_full, atol=2e-3)

    # half-occupied ray: budget larger than occupied space -> t_exit done
    occ2 = np.zeros((1, H, H, H), np.uint8)
    occ2[0, :, :, : H // 2] = 1
    m = sample_rays(ro, rd, jnp.asarray(occ2), nears, fars, num_coarse=128,
                    num_fine=32, grid_size=H, cascades=1, bound=1.0,
                    sample_dt=jnp.asarray([1.0], jnp.float32))
    assert float(m.t_exit[0]) > float(fars[0])


def test_occupied_length_matches_sampler():
    from nerf2mesh_tpu.ops.sampling import occupied_length
    H = 32
    occ2 = np.zeros((1, H, H, H), np.uint8)
    occ2[0, :, :, : H // 2] = 1          # z in [-1, 0): 1.0 of the 2.0 span
    ro, rd, nears, fars = _axis_ray()
    ol = occupied_length(ro, rd, jnp.asarray(occ2), nears, fars,
                         num_coarse=128, grid_size=H, cascades=1, bound=1.0)
    np.testing.assert_allclose(float(ol[0]), 1.0, rtol=0.1)
    ol0 = occupied_length(ro, rd, jnp.zeros((1, H, H, H), jnp.uint8), nears,
                          fars, num_coarse=128, grid_size=H, cascades=1,
                          bound=1.0)
    assert float(ol0[0]) == 0.0


def test_pooled_render_matches_dense():
    """render_train(pool_size=P) == render_train(pool_size=None) exactly
    when the pool fits all valid samples."""
    import jax
    import jax.numpy as jnp
    import numpy as np
    from nerf2mesh_tpu.models.network import NetworkSpec, init_network
    from nerf2mesh_tpu.models.renderer import RenderSpec, render_train

    net_spec = NetworkSpec(bound=1.0)
    rspec = RenderSpec(bound=1.0, grid_size=32, max_steps=64,
                       num_coarse=32, num_fine=8, dt_gamma=0.0)
    params = init_network(jax.random.PRNGKey(0), net_spec)
    N = 64
    k1, k2, k3 = jax.random.split(jax.random.PRNGKey(1), 3)
    rays_o = jnp.asarray([0.0, 0.0, 2.0]) + 0.1 * jax.random.normal(k1, (N, 3))
    rays_d = jax.random.normal(k2, (N, 3))
    rays_d = rays_d / jnp.linalg.norm(rays_d, axis=-1, keepdims=True)
    # point most rays at the scene
    rays_d = rays_d.at[:, 2].set(-jnp.abs(rays_d[:, 2]) - 0.5)
    rays_d = rays_d / jnp.linalg.norm(rays_d, axis=-1, keepdims=True)
    occ = jnp.ones((1, 32, 32, 32), jnp.uint8)
    bg = jnp.ones((N, 3))

    kwargs = dict(shading="full", perturb=False)
    dense = render_train(params, occ, rays_o, rays_d, bg, k3, rspec,
                         net_spec, **kwargs)
    pooled = render_train(params, occ, rays_o, rays_d, bg, k3, rspec,
                          net_spec, pool_size=N * 8, **kwargs)
    assert int(pooled["pool_overflow"]) == 0
    assert bool(jnp.all(pooled["ray_kept"]))
    for k in ("image", "depth", "weights_sum"):
        np.testing.assert_allclose(np.asarray(pooled[k]),
                                   np.asarray(dense[k]), atol=1e-5,
                                   err_msg=k)

    # gradients agree too (table + mlps)
    def loss(p, pool):
        out = render_train(p, occ, rays_o, rays_d, bg, k3, rspec, net_spec,
                           pool_size=pool, **kwargs)
        return jnp.sum(out["image"] ** 2)

    gd = jax.grad(loss)(params, None)
    gp = jax.grad(loss)(params, N * 8)
    for k in gd:
        np.testing.assert_allclose(
            np.asarray(jax.tree_util.tree_leaves(gp[k])[0]),
            np.asarray(jax.tree_util.tree_leaves(gd[k])[0]),
            atol=2e-4, err_msg=k)


def test_pool_overflow_is_loud_and_masks_rays():
    import jax
    import jax.numpy as jnp
    from nerf2mesh_tpu.models.network import NetworkSpec, init_network
    from nerf2mesh_tpu.models.renderer import RenderSpec, render_train

    net_spec = NetworkSpec(bound=1.0)
    rspec = RenderSpec(bound=1.0, grid_size=32, max_steps=64,
                       num_coarse=32, num_fine=8, dt_gamma=0.0)
    params = init_network(jax.random.PRNGKey(0), net_spec)
    N = 64
    rays_o = jnp.tile(jnp.asarray([[0.0, 0.0, 2.0]]), (N, 1))
    rays_d = jnp.tile(jnp.asarray([[0.0, 0.0, -1.0]]), (N, 1))
    occ = jnp.ones((1, 32, 32, 32), jnp.uint8)
    bg = jnp.ones((N, 3))
    out = render_train(params, occ, rays_o, rays_d, bg,
                       jax.random.PRNGKey(2), rspec, net_spec,
                       shading="full", perturb=False, pool_size=128)
    assert int(out["pool_overflow"]) > 0
    assert not bool(jnp.all(out["ray_kept"]))
