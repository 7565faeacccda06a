"""Native meshops tests: quadric decimation manifoldness (link condition),
vertex merge, component filtering."""

import numpy as np

from nerf2mesh_tpu.meshing import meshops


def _icosphere(subdiv=4):
    """Unit icosphere via midpoint subdivision of an icosahedron."""
    t = (1.0 + np.sqrt(5.0)) / 2.0
    v = np.array([
        [-1, t, 0], [1, t, 0], [-1, -t, 0], [1, -t, 0],
        [0, -1, t], [0, 1, t], [0, -1, -t], [0, 1, -t],
        [t, 0, -1], [t, 0, 1], [-t, 0, -1], [-t, 0, 1]], np.float32)
    f = np.array([
        [0, 11, 5], [0, 5, 1], [0, 1, 7], [0, 7, 10], [0, 10, 11],
        [1, 5, 9], [5, 11, 4], [11, 10, 2], [10, 7, 6], [7, 1, 8],
        [3, 9, 4], [3, 4, 2], [3, 2, 6], [3, 6, 8], [3, 8, 9],
        [4, 9, 5], [2, 4, 11], [6, 2, 10], [8, 6, 7], [9, 8, 1]], np.int64)
    from nerf2mesh_tpu.meshing.meshops import midpoint_subdivide
    for _ in range(subdiv):
        v, f = midpoint_subdivide(v, f, np.ones(len(f), bool))
        f = f.astype(np.int64)
    v = v / np.linalg.norm(v, axis=1, keepdims=True)
    return v.astype(np.float32), f.astype(np.int32)


def _edge_face_counts(f):
    e = np.concatenate([f[:, [0, 1]], f[:, [1, 2]], f[:, [2, 0]]])
    e = np.sort(e, axis=1)
    key = e[:, 0].astype(np.int64) * (f.max() + 2) + e[:, 1]
    _, counts = np.unique(key, return_counts=True)
    return counts


def test_decimate_stays_manifold():
    """Link-condition check: heavy decimation of a closed sphere must not
    create non-manifold edges (every edge in exactly 2 faces)."""
    v, f = _icosphere(4)                      # 5120 faces
    assert (_edge_face_counts(f) == 2).all()  # input is closed-manifold
    for target in (2000, 500, 120):
        dv, df = meshops.decimate_mesh(v, f, target)
        assert len(df) <= int(target * 1.15) + 20
        counts = _edge_face_counts(df)
        assert counts.max() <= 2, f"non-manifold edges at target={target}"
        # closed surface should stay closed (no boundary edges)
        assert (counts == 2).all()
        # geometry stays near the unit sphere
        r = np.linalg.norm(dv, axis=1)
        assert 0.8 < r.min() and r.max() < 1.1
