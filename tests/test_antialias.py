"""Antialias edge pass (dr.antialias analog, reference renderer.py:884-887).

Covers: exact 1-D coverage blending on silhouette pairs, strict vs dilated
coverage (the round-2 capstone's ~1px rim bug), gradient correctness vs
finite differences, occlusion-boundary blending, and end-to-end silhouette
placement learning through the AA gradient channel (the failure mode that
kept stage-1 4 dB under the quality gate in round 2).
"""

import jax
import jax.numpy as jnp
import numpy as np
import optax
import pytest

from nerf2mesh_tpu.models.rasterizer import (RasterSpec, antialias,
                                             rasterize_crop, transform_clip)

SPEC = RasterSpec(crop=16, max_tris=8, frag=16)


def screen_to_clip(pts_px, W=16, H=16, z=0.5):
    """Screen-pixel coords -> clip coords (w=1) for a 16x16 target."""
    pts_px = np.asarray(pts_px, np.float32)
    ndc_x = 2.0 * pts_px[:, 0] / W - 1.0
    ndc_y = 2.0 * pts_px[:, 1] / H - 1.0
    out = np.stack([ndc_x, ndc_y, np.full(len(pts_px), z, np.float32),
                    np.ones(len(pts_px), np.float32)], -1)
    return jnp.asarray(out)


def raster_edge(x_edge, z=0.5):
    """One big triangle whose vertical right edge sits at x=x_edge px."""
    clip = screen_to_clip([[x_edge, -10.0], [x_edge, 26.0], [-40.0, 8.0]],
                          z=z)
    tris = jnp.asarray([[0, 1, 2]], jnp.int32)
    return rasterize_crop(clip, tris, jnp.asarray([0, 0]), 16, 16, SPEC)


def rgba_of(rast, fg=1.0):
    a = rast["strict"].astype(jnp.float32)[..., None]
    return jnp.concatenate([jnp.repeat(a * fg, 3, axis=-1), a], axis=-1)


def test_strict_vs_dilated_coverage():
    # edge at 7.3: pixel col 7 (center 7.5) is OUTSIDE the triangle but
    # within the near-edge rasterization band -> covered yes, strict no.
    r = raster_edge(7.3)
    strict = np.asarray(r["strict"])
    covered = np.asarray(r["covered"])
    assert strict[8, 6] and not strict[8, 7]
    assert covered[8, 7], "near-edge outside winner should still rasterize"
    # interior rows: strict coverage = exact pixel-center test
    assert strict[8, :7].all()


def test_aa_exact_coverage_right_of_mid():
    # edge at 7.3 -> pair (6,7): u = 0.8 > 0.5: pixel 7 alpha = 0.3
    r = raster_edge(7.3)
    out = antialias(rgba_of(r), r, jnp.asarray([0, 0]))
    a = np.asarray(out[..., 3])
    assert a[8, 6] == pytest.approx(1.0, abs=1e-5)
    assert a[8, 7] == pytest.approx(0.3, abs=1e-4)
    assert a[8, 8] == pytest.approx(0.0, abs=1e-5)


def test_aa_exact_coverage_left_of_mid():
    # edge at 6.8 -> pair (6,7): u = 0.3 < 0.5: pixel 6 alpha = 0.8
    r = raster_edge(6.8)
    out = antialias(rgba_of(r), r, jnp.asarray([0, 0]))
    a = np.asarray(out[..., 3])
    assert a[8, 6] == pytest.approx(0.8, abs=1e-4)
    assert a[8, 7] == pytest.approx(0.0, abs=1e-5)


def test_aa_vertical_pairs():
    # horizontal bottom edge at y=7.3 (triangle covers y < 7.3)
    clip = screen_to_clip([[-10.0, 7.3], [26.0, 7.3], [8.0, -40.0]])
    tris = jnp.asarray([[0, 1, 2]], jnp.int32)
    r = rasterize_crop(clip, tris, jnp.asarray([0, 0]), 16, 16, SPEC)
    out = antialias(rgba_of(r), r, jnp.asarray([0, 0]))
    a = np.asarray(out[..., 3])
    assert a[6, 8] == pytest.approx(1.0, abs=1e-5)
    assert a[7, 8] == pytest.approx(0.3, abs=1e-4)


def test_aa_gradient_matches_finite_difference():
    tris = jnp.asarray([[0, 1, 2]], jnp.int32)

    def f(dx):
        clip = screen_to_clip([[7.3, -10.0], [7.3, 26.0], [-40.0, 8.0]])
        shift = jnp.zeros_like(clip).at[:2, 0].set(dx * 2.0 / 16)
        r = rasterize_crop(clip + shift, tris, jnp.asarray([0, 0]), 16, 16,
                           SPEC)
        out = antialias(rgba_of(r), r, jnp.asarray([0, 0]))
        return jnp.sum(out[..., 3])

    g = float(jax.grad(f)(0.0))
    h = 0.05
    fd = (float(f(h)) - float(f(-h))) / (2 * h)
    # moving the edge right adds coverage ~1px of alpha per crossed row
    assert g == pytest.approx(fd, rel=0.05)
    assert g > 5.0


def test_aa_occlusion_boundary_blend():
    # near triangle (z=0.2, rgb=1) with right edge at 7.3 in front of a
    # far full-cover triangle (z=0.8, rgb=0.25): both strict everywhere,
    # depth gap selects the near one as fg.
    near = [[7.3, -10.0], [7.3, 26.0], [-40.0, 8.0]]
    far = [[-40.0, -40.0], [60.0, -10.0], [8.0, 60.0]]
    clip = jnp.concatenate([screen_to_clip(near, z=0.2),
                            screen_to_clip(far, z=0.8)])
    tris = jnp.asarray([[0, 1, 2], [3, 4, 5]], jnp.int32)
    r = rasterize_crop(clip, tris, jnp.asarray([0, 0]), 16, 16, SPEC)
    strict = np.asarray(r["strict"])
    assert strict[8, 6] and strict[8, 7]
    fgc, bgc = 1.0, 0.25
    a = r["strict"].astype(jnp.float32)[..., None]
    rgb = jnp.where(np.asarray(r["win_slot"])[..., None] == 0, fgc, bgc) * a
    rgb = jnp.repeat(rgb, 3, axis=-1)
    out = antialias(jnp.concatenate([rgb, a], -1), r, jnp.asarray([0, 0]))
    got = np.asarray(out)
    # u=0.8: near bleeds 0.3 of its color into pixel 7
    assert got[8, 7, 0] == pytest.approx(bgc + 0.3 * (fgc - bgc), abs=1e-3)
    assert got[8, 7, 3] == pytest.approx(1.0, abs=1e-5)  # alpha unchanged
    assert got[8, 6, 0] == pytest.approx(fgc, abs=1e-3)


def test_aa_learns_silhouette_placement():
    """The capstone failure mode: a hard-edged GT whose silhouette sits
    ~0.8px from the initial mesh edge.  The AA gradient must move the
    vertices until the hard pixel-center render matches GT exactly."""
    base = np.array([[7.3, -10.0], [7.3, 26.0], [-40.0, 8.0]], np.float32)
    tris = jnp.asarray([[0, 1, 2]], jnp.int32)

    # GT: hard coverage of an edge at x=8.1 -> pixel centers < 8.1 are fg
    gt_r = raster_edge(8.1)
    gt = jnp.asarray(np.asarray(gt_r["strict"], np.float32))

    def render_alpha(off_px):
        pts = jnp.asarray(base) + jnp.stack(
            [off_px, jnp.zeros_like(off_px)], -1)
        ndc_x = 2.0 * pts[:, 0] / 16 - 1.0
        ndc_y = 2.0 * pts[:, 1] / 16 - 1.0
        clip = jnp.stack([ndc_x, ndc_y, jnp.full((3,), 0.5),
                          jnp.ones((3,))], -1)
        r = rasterize_crop(clip, tris, jnp.asarray([0, 0]), 16, 16, SPEC)
        out = antialias(rgba_of(r), r, jnp.asarray([0, 0]))
        return out[..., 3], r

    @jax.jit
    def loss_fn(off_px):
        a, _ = render_alpha(off_px)
        return jnp.mean((a - gt) ** 2)

    off = jnp.zeros((3,))
    opt = optax.adam(0.05)
    st = opt.init(off)
    g_fn = jax.jit(jax.grad(loss_fn))
    for _ in range(200):
        g = g_fn(off)
        upd, st = opt.update(g, st)
        off = optax.apply_updates(off, upd)

    # MSE optimum vs a hard GT centers the crossing at u=0.5 -> edge at 8.0
    edge = float(7.3 + off[0])
    assert abs(edge - 8.0) < 0.15, f"edge converged to {edge}, want ~8.0"
    # and the hard render now matches GT exactly
    _, r = render_alpha(off)
    assert np.array_equal(np.asarray(r["strict"]), np.asarray(gt) > 0.5)


def test_render_stage1_crop_aa_mode_runs():
    """alpha_mode plumbing through render_stage1_crop (shape + finiteness +
    aa-vs-hard rim difference)."""
    from nerf2mesh_tpu.models.network import NetworkSpec, init_network
    from nerf2mesh_tpu.models.stage1 import render_stage1_crop

    nspec = NetworkSpec(bound=1.0, log2_hashmap_size=8, num_levels=4)
    params = init_network(jax.random.PRNGKey(0), nspec)
    # small sphere-ish mesh: octahedron
    v = np.array([[1, 0, 0], [-1, 0, 0], [0, 1, 0], [0, -1, 0],
                  [0, 0, 1], [0, 0, -1]], np.float32) * 0.4
    f = np.array([[0, 2, 4], [2, 1, 4], [1, 3, 4], [3, 0, 4],
                  [2, 0, 5], [1, 2, 5], [3, 1, 5], [0, 3, 5]], np.int32)
    # orthographic-ish mvp looking down -z
    mvp = np.eye(4, dtype=np.float32)
    mvp[2, 2] = 0.5
    spec = RasterSpec(crop=16, max_tris=8, frag=16)
    dirs = np.broadcast_to(np.array([0, 0, -1.0], np.float32), (16, 16, 3))
    bg = np.ones((16, 16, 3), np.float32)
    outs = {}
    for mode in ("aa", "hard", "soft"):
        out = render_stage1_crop(
            params, jnp.zeros_like(jnp.asarray(v)), jnp.asarray(v),
            jnp.asarray(f), jnp.asarray(mvp), jnp.asarray([0, 0]),
            jnp.asarray(dirs), jnp.asarray(bg), nspec, spec, 16, 16,
            alpha_mode=mode)
        assert np.isfinite(np.asarray(out["image"])).all()
        outs[mode] = np.asarray(out["weights_sum"])
    assert set(np.unique(outs["hard"])) <= {0.0, 1.0}
    # aa produces fractional rim alphas hard does not
    frac = (outs["aa"] > 0.01) & (outs["aa"] < 0.99)
    assert frac.any()
