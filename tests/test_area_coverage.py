"""Exact-area coverage tests (alpha_mode="area", rasterizer `area` output).

The estimator contract: per pixel, the clamped sum of exact
|triangle ∩ pixel| areas over front-facing fragments equals the union area
coverage of the front surface — unbiased at silhouettes (the round-4 oracle
probe measured strict+AA eval under-covering rims by ~0.09 alpha even with
perfect geometry), and exactly 1 on interior pixels tiled by a mesh.
"""

import jax
import jax.numpy as jnp
import numpy as np

from nerf2mesh_tpu.models.rasterizer import RasterSpec, rasterize_crop

H = W = 32
SPEC = RasterSpec(crop=32, max_tris=64, frag=32)


def ortho_clip(verts_ndc):
    v = np.asarray(verts_ndc, np.float32)
    return jnp.asarray(
        np.concatenate([v, np.ones((len(v), 1), np.float32)], -1))


def ndc_of_px(x_px, y_px):
    """Pixel coords -> ndc (screen mapping sx = (ndc+1)/2 * W)."""
    return 2.0 * x_px / W - 1.0, 2.0 * y_px / H - 1.0


def tri_pixel_area_ref(tri_px, x0, y0):
    """Reference |triangle ∩ unit pixel| via Sutherland–Hodgman (numpy)."""
    poly = [np.asarray(p, np.float64) for p in tri_px]

    def clip(poly, inside, intersect):
        out = []
        n = len(poly)
        for i in range(n):
            a, b = poly[i], poly[(i + 1) % n]
            ia, ib = inside(a), inside(b)
            if ia:
                out.append(a)
                if not ib:
                    out.append(intersect(a, b))
            elif ib:
                out.append(intersect(a, b))
        return out

    for axis, lo, sign in ((0, x0, 1), (0, x0 + 1, -1),
                           (1, y0, 1), (1, y0 + 1, -1)):
        if not poly:
            return 0.0
        poly = clip(
            poly,
            lambda p, axis=axis, lo=lo, sign=sign: sign * (p[axis] - lo) >= 0,
            lambda a, b, axis=axis, lo=lo: a + (b - a) * (
                (lo - a[axis]) / (b[axis] - a[axis])),
        )
    if len(poly) < 3:
        return 0.0
    p = np.asarray(poly)
    x, y = p[:, 0], p[:, 1]
    return 0.5 * abs(np.dot(x, np.roll(y, -1)) - np.dot(y, np.roll(x, -1)))


def render_area(verts_px, tris):
    """Rasterize triangles given in PIXEL coords; return the area image."""
    v = np.asarray(verts_px, np.float32)
    nx, ny = ndc_of_px(v[:, 0], v[:, 1])
    ndc = np.stack([nx, ny, np.full_like(nx, 0.5)], -1)
    r = rasterize_crop(ortho_clip(ndc), jnp.asarray(tris, jnp.int32),
                       jnp.asarray([0, 0]), H, W, SPEC)
    return np.asarray(r["area"])


def test_area_matches_polygon_clipper(rng):
    """Random triangles: per-pixel area == exact polygon clipping."""
    for _ in range(12):
        tri = rng.uniform(2.0, 30.0, size=(3, 2))
        # skip near-degenerate triangles (reference clipper is exact there
        # too, but they exercise nothing)
        e1, e2 = tri[1] - tri[0], tri[2] - tri[0]
        area2 = abs(e1[0] * e2[1] - e1[1] * e2[0])
        if area2 < 4.0:
            continue
        img = render_area(tri, [[0, 1, 2]])
        xs = slice(max(int(tri[:, 0].min()) - 1, 0),
                   min(int(tri[:, 0].max()) + 2, W))
        ys = slice(max(int(tri[:, 1].min()) - 1, 0),
                   min(int(tri[:, 1].max()) + 2, H))
        for y in range(ys.start, ys.stop):
            for x in range(xs.start, xs.stop):
                ref = tri_pixel_area_ref(tri, x, y)
                assert abs(img[y, x] - ref) < 1e-4, (x, y, img[y, x], ref)


def test_area_interior_tiles_to_one(rng):
    """Two triangles tiling a quad: interior pixels sum to exactly 1 and the
    shared diagonal contributes no seam."""
    quad = np.array([[4.3, 5.1], [27.6, 4.7], [28.2, 26.9], [3.9, 27.4]])
    tris = [[0, 1, 2], [0, 2, 3]]
    img = render_area(quad, tris)
    # interior: strictly inside the quad with a 2px margin
    np.testing.assert_allclose(img[8:24, 7:25], 1.0, atol=1e-3)
    # total area matches the quad's shoelace area
    x, y = quad[:, 0], quad[:, 1]
    ref = 0.5 * abs(np.dot(x, np.roll(y, -1)) - np.dot(y, np.roll(x, -1)))
    np.testing.assert_allclose(img.sum(), ref, rtol=1e-3)


def test_area_backface_clamps_away():
    """A back-facing copy of a front triangle must not cancel its coverage
    (front/back rim slivers of a closed mesh would otherwise zero out)."""
    tri = np.array([[6.0, 6.0], [26.0, 8.0], [14.0, 25.0]])
    img_f = render_area(tri, [[0, 1, 2]])
    img_fb = render_area(np.concatenate([tri, tri]),
                         [[0, 1, 2], [3, 5, 4]])   # reversed winding
    np.testing.assert_allclose(img_fb, img_f, atol=1e-5)


def test_area_gradient_matches_finite_difference():
    """d(total area)/d(vertex) against central differences."""
    tri = np.array([[6.2, 7.1], [24.8, 9.3], [13.4, 24.6]], np.float32)

    def total(vflat):
        v = vflat.reshape(3, 2)
        nx = 2.0 * v[:, 0] / W - 1.0
        ny = 2.0 * v[:, 1] / H - 1.0
        ndc = jnp.stack([nx, ny, jnp.full_like(nx, 0.5),
                         jnp.ones_like(nx)], -1)
        r = rasterize_crop(ndc, jnp.asarray([[0, 1, 2]], jnp.int32),
                           jnp.asarray([0, 0]), H, W, SPEC)
        return jnp.sum(r["area"])

    g = jax.grad(total)(jnp.asarray(tri.ravel()))
    g = np.asarray(g)
    eps = 1e-3
    for k in range(6):
        vp = tri.ravel().copy(); vp[k] += eps
        vm = tri.ravel().copy(); vm[k] -= eps
        fd = (float(total(jnp.asarray(vp))) - float(total(jnp.asarray(vm)))) \
            / (2 * eps)
        assert abs(g[k] - fd) < 1e-2 + 5e-3 * abs(fd), (k, g[k], fd)


def test_area_rim_unbiased_on_disc():
    """A triangle-fan disc: mean coverage error on rim pixels < 0.02 — the
    regime where strict+AA measured ~0.09 bias (oracle probe)."""
    cx, cy, R = 16.0, 16.0, 10.3
    n = 64
    ang = np.linspace(0, 2 * np.pi, n, endpoint=False)
    pts = np.stack([cx + R * np.cos(ang), cy + R * np.sin(ang)], -1)
    verts = np.concatenate([[[cx, cy]], pts])
    tris = [[0, 1 + i, 1 + (i + 1) % n] for i in range(n)]
    img = render_area(verts, tris)

    # analytic circle coverage per pixel via supersampling (512 samples)
    yy, xx = np.meshgrid(np.arange(H), np.arange(W), indexing="ij")
    rng = np.random.default_rng(1)
    sub = rng.uniform(0, 1, size=(512, 2))
    cov = np.zeros((H, W))
    for s in sub:
        d2 = (xx + s[0] - cx) ** 2 + (yy + s[1] - cy) ** 2
        cov += (d2 < R * R)
    cov /= len(sub)

    rim = (cov > 0.02) & (cov < 0.98)
    err = img - cov
    # polygon-vs-circle faceting costs ~R*(1-cos(pi/n)) ~ 0.05px of radius;
    # the estimator itself must not add bias beyond that
    assert abs(err[rim].mean()) < 0.02, err[rim].mean()
    assert np.abs(err[rim]).mean() < 0.03, np.abs(err[rim]).mean()


def test_union_immune_to_folded_overlap():
    """A mesh fold (two coplanar same-depth layers over the same region)
    must NOT double silhouette coverage: the area-SUM reads ~2x on partial
    pixels, the 4x4-subsample union reads the true coverage (round-4
    oracle-v2 probe: folded capstone rims read cov 0.95 vs true 0.48)."""
    # one triangle covering the left half-ish of the crop, duplicated
    x0a, y0a = ndc_of_px(2.0, 2.0)
    x1a, y1a = ndc_of_px(17.5, 2.0)     # vertical edge at x=17.5 px
    x2a, y2a = ndc_of_px(2.0, 30.0)
    x3a, y3a = ndc_of_px(17.5, 30.0)
    v = ortho_clip([[x0a, y0a, 0.0], [x1a, y1a, 0.0], [x2a, y2a, 0.0],
                    [x3a, y3a, 0.0]])
    quad = np.asarray([[0, 1, 2], [1, 3, 2]], np.int32)
    tris1 = jnp.asarray(quad)
    tris2 = jnp.asarray(np.concatenate([quad, quad]))   # folded duplicate

    r1 = rasterize_crop(v, tris1, jnp.asarray([0, 0]), H, W, SPEC)
    r2 = rasterize_crop(v, tris2, jnp.asarray([0, 0]), H, W, SPEC)
    col = 17  # the partial column: true coverage 0.5
    rows = slice(4, 28)
    u1 = np.asarray(r1["union"])[rows, col]
    u2 = np.asarray(r2["union"])[rows, col]
    a2 = np.asarray(r2["area"])[rows, col]
    np.testing.assert_allclose(u1, 0.5, atol=0.13)       # 1/16 quantization
    np.testing.assert_allclose(u2, u1, atol=1e-6)        # union: no double
    assert a2.mean() > 0.9, a2.mean()                    # sum: doubled

    # interior pixels stay fully covered under union
    assert np.asarray(r2["union"])[8, 8] == 1.0
