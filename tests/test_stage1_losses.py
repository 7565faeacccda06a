"""Stage-1 mesh regularizer + UV atlas + mesh IO tests."""

import os

import jax
import jax.numpy as jnp
import numpy as np

from nerf2mesh_tpu.models.stage1 import (
    Stage1Mesh, edge_length_loss, laplacian_loss, normal_consistency_loss,
    offsets_loss,
)


def _quad_mesh():
    # two triangles sharing an edge, in the z=0 plane
    v = np.array([[0, 0, 0], [1, 0, 0], [0, 1, 0], [1, 1, 0]], np.float32)
    f = np.array([[0, 1, 2], [1, 3, 2]], np.int32)
    return Stage1Mesh(vertices=v, triangles=f,
                      v_cumsum=np.array([0, 4]), f_cumsum=np.array([0, 2]))


def test_adjacency():
    m = _quad_mesh()
    assert len(m.edges) == 5                 # 4 border + 1 shared
    assert len(m.face_pairs) == 1            # one shared edge
    assert set(m.face_pairs[0]) == {0, 1}


def test_normal_consistency_flat_vs_bent():
    m = _quad_mesh()
    v = jnp.asarray(m.vertices)
    f = jnp.asarray(m.triangles)
    fp = jnp.asarray(m.face_pairs)
    flat = float(normal_consistency_loss(v, f, fp))
    assert flat < 1e-6                       # coplanar faces agree
    bent = v.at[3, 2].set(0.8)               # fold along the shared edge
    assert float(normal_consistency_loss(bent, f, fp)) > 0.05


def test_laplacian_zero_offsets_finite_grad():
    """Regression: grad of the laplacian at exactly-zero offsets must be
    finite (jnp d|x|/dx at 0 is NaN without the eps)."""
    m = _quad_mesh()
    edges = jnp.asarray(m.edges)
    deg = jnp.asarray(m.vert_degree)
    base = jnp.asarray(m.vertices)

    def loss(off):
        return laplacian_loss(base + off, edges, deg)

    g = jax.grad(loss)(jnp.zeros_like(base))
    assert np.isfinite(np.asarray(g)).all()


def test_edge_and_offset_losses():
    m = _quad_mesh()
    v = jnp.asarray(m.vertices)
    el = float(edge_length_loss(v, jnp.asarray(m.edges)))
    # edges: 4 of length 1, 1 diagonal sqrt(2): mean sq = (4*1 + 2)/5
    np.testing.assert_allclose(el, 6 / 5, rtol=1e-5)
    off = jnp.ones((4, 3)) * 0.1
    np.testing.assert_allclose(float(offsets_loss(off, 4, 1.0)), 0.03, rtol=1e-5)


def test_uvatlas_contract(rng):
    from nerf2mesh_tpu.meshing.marching_cubes import marching_cubes
    from nerf2mesh_tpu.meshing.uvatlas import unwrap_uv
    R = 24
    ax = np.linspace(-1, 1, R)
    x, y, z = np.meshgrid(ax, ax, ax, indexing="ij")
    v, f = marching_cubes(0.6 - np.sqrt(x * x + y * y + z * z), 0.0)
    vmapping, ft, vt = unwrap_uv(v, f)
    assert ft.shape == f.shape
    assert vt.shape == (len(vmapping), 2)
    assert (vt >= 0).all() and (vt <= 1).all()
    assert (vmapping >= 0).all() and (vmapping < len(v)).all()
    assert (ft >= 0).all() and (ft < len(vt)).all()
    # every uv face must reference the same world vertices as the mesh face
    np.testing.assert_array_equal(vmapping[ft], f)


def test_ply_roundtrip(tmp_path, rng):
    from nerf2mesh_tpu.meshing.io import read_ply, write_ply
    v = rng.normal(size=(17, 3)).astype(np.float32)
    f = rng.integers(0, 17, (9, 3)).astype(np.int32)
    p = os.path.join(tmp_path, "m.ply")
    write_ply(p, v, f)
    v2, f2 = read_ply(p)
    np.testing.assert_array_equal(v, v2)
    np.testing.assert_array_equal(f, f2)


def test_perceptual_loss_properties():
    """Weight-free LPIPS analog: zero at identity, >0 for perturbed, finite
    gradients, sensitive to structure not just mean shift."""
    from nerf2mesh_tpu.utils.losses import perceptual_loss

    key = jax.random.PRNGKey(0)
    img = jax.random.uniform(key, (64, 64, 3))
    assert float(perceptual_loss(img, img)) < 1e-10

    noisy = jnp.clip(img + 0.3 * jax.random.normal(key, img.shape), 0, 1)
    d_noise = float(perceptual_loss(noisy, img))
    assert d_noise > 1e-4

    g = jax.grad(lambda p: perceptual_loss(p, img))(noisy)
    assert np.isfinite(np.asarray(g)).all()
    assert np.abs(np.asarray(g)).max() > 0

    # shuffled image (same histogram, destroyed structure) must be farther
    # than a small uniform brightness shift
    flat = img.reshape(-1, 3)
    perm = jax.random.permutation(key, flat.shape[0])
    shuffled = flat[perm].reshape(img.shape)
    d_shuffle = float(perceptual_loss(shuffled, img))
    d_shift = float(perceptual_loss(jnp.clip(img + 0.02, 0, 1), img))
    assert d_shuffle > d_shift


def test_render_stage1_crop_ssaa_pools_to_crop():
    """ssaa=2 renders 2x supersampled and pools back; shapes + consistency
    with the ssaa=1 render on a simple quad."""
    from nerf2mesh_tpu.models.rasterizer import RasterSpec
    from nerf2mesh_tpu.models.network import NetworkSpec, init_network
    from nerf2mesh_tpu.models.stage1 import render_stage1_crop

    H = W = 32
    spec = NetworkSpec(bound=1.0, log2_hashmap_size=8, num_levels=4)
    params = init_network(jax.random.PRNGKey(0), spec)
    rspec = RasterSpec(crop=32, max_tris=16, frag=32)

    # screen-filling quad at z=0.5 (identity mvp)
    v = jnp.asarray([[-1, -1, 0.5], [1, -1, 0.5], [-1, 1, 0.5], [1, 1, 0.5]],
                    jnp.float32)
    f = jnp.asarray([[0, 1, 2], [1, 3, 2]], jnp.int32)
    mvp = jnp.eye(4)
    off = jnp.zeros((4, 3))
    origin = jnp.asarray([0, 0])

    def render(s):
        C = 32 * s
        dirs = jnp.broadcast_to(jnp.asarray([0.0, 0.0, 1.0]), (C, C, 3))
        bg = jnp.ones((C, C, 3))
        return render_stage1_crop(
            params, off, v, f, mvp, origin, dirs, bg, spec, rspec,
            H, W, ssaa=s)

    o1 = render(1)
    o2 = render(2)
    assert o2["image"].shape == (32, 32, 3)
    assert o2["trig_id"].shape == (64, 64)
    assert o2["weights_sum"].shape == (32, 32)
    # quad fills the screen: both fully covered, same field colors inside
    err = float(jnp.abs(o1["image"][4:-4, 4:-4] - o2["image"][4:-4, 4:-4]).max())
    assert err < 0.05


def test_lpips_meter_proxy_fallback():
    """Without lpips-vgg weights the meter reports the weight-free proxy
    under a distinct name instead of going inert."""
    from nerf2mesh_tpu.utils.metrics import LPIPSMeter
    m = LPIPSMeter()
    assert m.available
    a = np.random.RandomState(0).rand(32, 32, 3).astype(np.float32)
    b = np.clip(a + 0.2, 0, 1)
    m.update(a, a)
    m.update(a, b)
    assert m.N == 2
    assert m.measure() > 0
    if m.fn is None:
        assert m.name == "LPIPS (proxy)"
