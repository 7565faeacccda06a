"""Differentiable rasterizer tests (contract: nvdiffrast behavior used at
reference renderer.py:860-887): coverage, depth ordering, perspective-correct
interpolation, and gradient flow to vertices."""

import jax
import jax.numpy as jnp
import numpy as np

from nerf2mesh_tpu.models.rasterizer import (
    RasterSpec, interpolate, rasterize_crop, transform_clip,
)

H = W = 64
SPEC = RasterSpec(crop=64, max_tris=16, frag=64)


def ortho_clip(verts_ndc):
    """Treat given ndc coords as clip with w=1."""
    v = np.asarray(verts_ndc, np.float32)
    return jnp.asarray(np.concatenate([v, np.ones((len(v), 1), np.float32)], -1))


def test_single_triangle_coverage_and_id():
    # big triangle covering lower-left half of ndc space
    verts = ortho_clip([[-1, -1, 0.5], [1, -1, 0.5], [-1, 1, 0.5]])
    tris = jnp.asarray([[0, 1, 2]], jnp.int32)
    r = rasterize_crop(verts, tris, jnp.asarray([0, 0]), H, W, SPEC)
    tid = np.asarray(r["tri_id"])
    # pixel (row, col): ndc y=+1 is row H; triangle covers x+y<0 region
    assert tid[10, 10] == 0          # near (-0.7, -0.7)
    assert tid[60, 60] == -1         # near (+0.9, +0.9) empty
    cov = np.asarray(r["covered"])
    assert 0.3 < cov.mean() < 0.7    # about half the crop
    a = np.asarray(r["alpha"])
    assert a[10, 10] > 0.95
    assert a[60, 60] < 0.05


def test_depth_ordering():
    # two overlapping triangles; nearer (smaller ndc z) must win
    verts = ortho_clip([
        [-1, -1, 0.8], [1, -1, 0.8], [0, 1, 0.8],     # far tri 0
        [-1, -1, 0.2], [1, -1, 0.2], [0, 1, 0.2],     # near tri 1
    ])
    tris = jnp.asarray([[0, 1, 2], [3, 4, 5]], jnp.int32)
    r = rasterize_crop(verts, tris, jnp.asarray([0, 0]), H, W, SPEC)
    tid = np.asarray(r["tri_id"])
    inside = tid >= 0
    assert inside.any()
    assert np.all(tid[inside] == 1)
    d = np.asarray(r["depth"])
    np.testing.assert_allclose(d[inside], 0.2, atol=1e-3)


def test_interpolation_linear_field():
    # attribute = ndc x coordinate; interpolated value must equal pixel x
    verts_ndc = np.array([[-1, -1, 0.5], [3, -1, 0.5], [-1, 3, 0.5]], np.float32)
    verts = ortho_clip(verts_ndc)  # covers whole crop
    tris = jnp.asarray([[0, 1, 2]], jnp.int32)
    r = rasterize_crop(verts, tris, jnp.asarray([0, 0]), H, W, SPEC)
    attr = jnp.asarray(verts_ndc[:, :1])
    out = np.asarray(interpolate(attr, r, tris))[..., 0]
    cov = np.asarray(r["covered"])
    # pixel (row y, col x) center -> ndc x = (x + 0.5)/W*2 - 1
    xs = (np.arange(W) + 0.5) / W * 2 - 1
    expect = np.tile(xs, (H, 1))
    np.testing.assert_allclose(out[cov], expect[cov], atol=2e-2)


def test_perspective_correct_bary():
    # vertical quad edge-on-ish: attribute varies with depth; perspective
    # interpolation differs from screen-linear.  Use w != 1.
    v = np.array([
        [-0.8, -0.8, 0.2, 1.0],
        [0.8, -0.8, 0.2, 1.0],
        [-0.8, 0.8, 0.9, 4.0],     # far vertex with larger w
    ], np.float32)
    # clip coords: multiply ndc by w
    clip = v.copy()
    clip[:, :3] *= clip[:, 3:4]
    verts = jnp.asarray(clip)
    tris = jnp.asarray([[0, 1, 2]], jnp.int32)
    r = rasterize_crop(verts, tris, jnp.asarray([0, 0]), H, W, SPEC)
    b = np.asarray(r["bary"])
    cov = np.asarray(r["covered"])
    assert cov.any()
    # barycentrics sum to 1 and in [0,1]
    s = b.sum(-1)
    np.testing.assert_allclose(s[cov], 1.0, atol=1e-4)
    # perspective correctness: midpoint of edge v0-v2 in SCREEN space should
    # have bary_2 < 0.5 (far vertex with larger w pulls less)
    row = int((((-0.8 + 0.8) / 2 / 2 + 0.5)) * H)  # screen midpoint row ~ H/2
    col = int(((-0.8 / 2 + 0.5)) * W) + 2
    if cov[row, col]:
        assert b[row, col, 2] < 0.5


def test_gradient_to_vertices():
    """Moving a vertex changes soft coverage -> nonzero, finite grad."""
    tris = jnp.asarray([[0, 1, 2]], jnp.int32)
    target = jnp.zeros((64, 64))

    def loss(shift):
        v = jnp.asarray([[-0.5, -0.5, 0.5], [0.5 + shift, -0.5, 0.5],
                         [0.0, 0.5, 0.5]])
        clip = jnp.concatenate([v, jnp.ones((3, 1))], -1)
        r = rasterize_crop(clip, tris, jnp.asarray([0, 0]), H, W, SPEC)
        return jnp.sum((r["alpha"] - target) ** 2)

    g = jax.grad(loss)(0.0)
    assert np.isfinite(float(g))
    assert abs(float(g)) > 1e-3
    # growing the triangle increases coverage -> increases loss
    assert float(g) > 0


def test_gradient_through_interpolation():
    tris = jnp.asarray([[0, 1, 2]], jnp.int32)

    def loss(dz):
        v = jnp.asarray([[-1.0, -1.0, 0.5], [3.0, -1.0, 0.5], [-1.0, 3.0, 0.5]])
        clip = jnp.concatenate([v, jnp.ones((3, 1))], -1)
        r = rasterize_crop(clip, tris, jnp.asarray([0, 0]), H, W, SPEC)
        attr = jnp.asarray([[0.0], [1.0], [2.0]]) + dz
        img = interpolate(attr, r, tris)
        return jnp.mean(img ** 2)

    g = jax.grad(loss)(0.0)
    assert np.isfinite(float(g)) and abs(float(g)) > 1e-4


def test_subpixel_triangles_interior_opaque():
    """Dense meshes (sub-pixel triangles, stage-1 after subdivision) must not
    render half-transparent: pixel centers interior to the surface get
    alpha=1; the soft silhouette ramp applies only outside all triangles."""
    n = 64
    xs = np.linspace(-0.5, 0.5, n + 1, dtype=np.float32)
    vv = np.stack(np.meshgrid(xs, xs, indexing="ij"), -1).reshape(-1, 2)
    verts = np.concatenate(
        [vv, np.full((len(vv), 1), 0.5, np.float32),
         np.ones((len(vv), 1), np.float32)], -1)
    idx = np.arange((n + 1) * (n + 1)).reshape(n + 1, n + 1)
    a, b, c, d = idx[:-1, :-1], idx[1:, :-1], idx[:-1, 1:], idx[1:, 1:]
    tris = np.concatenate(
        [np.stack([a, b, c], -1).reshape(-1, 3),
         np.stack([b, d, c], -1).reshape(-1, 3)]).astype(np.int32)
    spec = RasterSpec(crop=64, max_tris=1 << 13, frag=8)
    r = rasterize_crop(jnp.asarray(verts), jnp.asarray(tris),
                       jnp.asarray([0, 0]), 64, 64, spec)
    alpha = np.asarray(r["alpha"])
    assert alpha[24:40, 24:40].min() > 0.99    # interior opaque
    assert alpha[:12, :12].max() < 0.01        # far outside transparent


def test_overflow_counter():
    """Triangles past the compaction budget K must be COUNTED, not silently
    dropped (round-1 failure: 97% of 4.2M triangles dropped without a trace)."""
    rng = np.random.default_rng(0)
    n = 40
    spec = RasterSpec(crop=64, max_tris=16, frag=8)
    # n small triangles, all overlapping the crop
    c = rng.uniform(-0.8, 0.8, (n, 2))
    v = np.concatenate([
        np.stack([c[:, 0], c[:, 1]], -1),
        np.stack([c[:, 0] + 0.05, c[:, 1]], -1),
        np.stack([c[:, 0], c[:, 1] + 0.05], -1),
    ], 0)
    verts = ortho_clip(np.concatenate([v, np.full((3 * n, 1), 0.5)], -1))
    tris = jnp.asarray(np.stack([np.arange(n), np.arange(n) + n,
                                 np.arange(n) + 2 * n], -1), jnp.int32)
    r = rasterize_crop(verts, tris, jnp.asarray([0, 0]), H, W, spec)
    assert int(r["overflow"]) == n - 16
    # under budget: no overflow
    spec_big = RasterSpec(crop=64, max_tris=64, frag=8)
    r2 = rasterize_crop(verts, tris, jnp.asarray([0, 0]), H, W, spec_big)
    assert int(r2["overflow"]) == 0


def test_inside_fragment_beats_near_edge_outside():
    """The depth winner must be a strictly-inside fragment when one covers the
    pixel: near-edge OUTSIDE fragments (rasterized for soft silhouette alpha)
    carry extrapolated barycentrics and would query the field off-surface."""
    # far triangle strictly containing the pixel center; near triangle whose
    # edge passes ~0.3px outside the same pixel center (still rasterized:
    # sdist > -0.5).  pixel (32,32) center = ndc (0.015625, 0.015625)... use
    # crop pixel (8,8): center px (8.5, 8.5) -> ndc (8.5/32-1) = -0.734
    px = py = 8.5
    nx = px / W * 2 - 1
    ny = py / H * 2 - 1
    eps_px = 0.3 / (W / 2)            # 0.3 pixel in ndc units
    verts = ortho_clip([
        # tri 0 (far, z=0.8): big, strictly contains the pixel center
        [nx - 0.5, ny - 0.5, 0.8], [nx + 0.5, ny - 0.5, 0.8], [nx, ny + 0.5, 0.8],
        # tri 1 (near, z=0.2): to the right of a vertical edge at
        # x = nx + eps, so the pixel center is ~0.3px OUTSIDE it
        [nx + eps_px, ny - 0.5, 0.2], [nx + 0.5, ny - 0.5, 0.2],
        [nx + eps_px, ny + 0.5, 0.2],
    ])
    tris = jnp.asarray([[0, 1, 2], [3, 4, 5]], jnp.int32)
    spec = RasterSpec(crop=64, max_tris=16, frag=64)
    r = rasterize_crop(verts, tris, jnp.asarray([0, 0]), H, W, spec)
    tid = np.asarray(r["tri_id"])
    assert tid[8, 8] == 0, f"winner {tid[8,8]}: outside fragment beat inside"
    # a pixel strictly inside BOTH must go to the nearer triangle
    assert tid[8, 12] == 1


def test_subdivision_budget_and_camera_depth():
    """subdivide_for_raster honors the hard face budget; load_stage1_mesh
    scales the edge bound by actual camera distance (round-1: z=1 assumption
    at z=2.5 exploded faces 42x past the K budget)."""
    from nerf2mesh_tpu.models.rasterizer import subdivide_for_raster
    from nerf2mesh_tpu.models.stage1 import camera_min_depth

    rng = np.random.default_rng(1)
    v = rng.uniform(-1, 1, (100, 3)).astype(np.float32)
    f = rng.integers(0, 100, (160, 3)).astype(np.int32)
    f = f[(f[:, 0] != f[:, 1]) & (f[:, 1] != f[:, 2]) & (f[:, 0] != f[:, 2])]
    v2, f2 = subdivide_for_raster(v, f, max_edge=0.01, max_faces=1200)
    assert len(f2) <= 1200 + 4 * len(f)  # ~budget (one round may overshoot)
    assert len(f2) > len(f)

    # camera at distance 2.5 from a unit box: min depth ~ (2.5-1)*0.7
    pose = np.eye(4)[None].repeat(3, 0)
    pose[:, 2, 3] = [2.5, 4.0, 3.0]
    z = camera_min_depth(pose, np.array([-1., -1, -1]), np.array([1., 1, 1]))
    assert abs(z - (2.5 - 1.0) * 0.7) < 1e-6


def test_degenerate_sliver_no_streaks():
    """An edge-on (near-zero projected area) sliver must not paint soft
    alpha along its projected segment nor win the depth resolve over a real
    triangle behind it (the round-2 capstone 'hairs'/speckle root cause)."""
    # sliver: three nearly-collinear points spanning the crop diagonal
    verts = ortho_clip([
        [-0.9, -0.9, 0.2], [0.9, 0.9, 0.2], [0.0, 0.0015, 0.2],  # sliver (front)
        [-1, -1, 0.8], [1, -1, 0.8], [-1, 1, 0.8],               # real tri (behind)
    ])
    tris = jnp.asarray([[0, 1, 2], [3, 4, 5]], jnp.int32)
    r = rasterize_crop(verts, tris, jnp.asarray([0, 0]), H, W, SPEC)
    tid = np.asarray(r["tri_id"])
    a = np.asarray(r["alpha"])
    # inside the real triangle's area the real triangle must win everywhere
    assert tid[10, 10] == 1
    assert tid[20, 18] == 1
    # outside the real triangle, along the sliver's segment, alpha ~ 0
    # (old behavior: ~0.5 'hair' streaks)
    assert a[50, 52] < 0.05
    assert a[60, 61] < 0.05


def test_sliver_fade_keeps_normal_triangles():
    """The inradius alpha fade must not dim ordinary triangles."""
    verts = ortho_clip([[-1, -1, 0.5], [1, -1, 0.5], [-1, 1, 0.5]])
    tris = jnp.asarray([[0, 1, 2]], jnp.int32)
    r = rasterize_crop(verts, tris, jnp.asarray([0, 0]), H, W, SPEC)
    a = np.asarray(r["alpha"])
    assert a[10, 10] > 0.95
