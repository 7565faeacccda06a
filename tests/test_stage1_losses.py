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
