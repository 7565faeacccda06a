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


def test_remesh_isotropic():
    """Isotropic explicit remeshing (meshutils.py:196-230): edge lengths move
    toward target_len, the mesh stays closed-manifold and on the surface."""
    v, f = _icosphere(4)
    # coarsen (target above input mean edge) and refine (below)
    for target in (0.15, 0.03):
        rv, rf, _ = meshops.remesh_mesh(v, f, target, iterations=4)
        counts = _edge_face_counts(rf)
        assert (counts == 2).all(), "remesh broke manifoldness"
        e = np.concatenate([rf[:, [0, 1]], rf[:, [1, 2]], rf[:, [2, 0]]])
        el = np.linalg.norm(rv[e[:, 0]] - rv[e[:, 1]], axis=-1)
        assert 0.5 * target < el.mean() < 1.6 * target
        r = np.linalg.norm(rv, axis=1)
        assert 0.95 < r.min() and r.max() < 1.05, "remesh left the sphere"


def test_remesh_selected_only():
    """Selected-only remeshing keeps unselected faces untouched and carries
    the per-face attribute through."""
    v, f = _icosphere(4)
    cm = v[f].mean(1)
    mask = (cm[:, 2] > 0).astype(np.int32)
    rv, rf, rm = meshops.remesh_mesh(v, f, 0.25, iterations=4,
                                     face_attr=mask, sel_attr=1)
    assert (_edge_face_counts(rf) == 2).all()
    # unselected region: exact same number of faces survives
    assert (rm == 0).sum() == (mask == 0).sum()
    e01 = np.linalg.norm(rv[rf[:, 0]] - rv[rf[:, 1]], axis=-1)
    assert e01[rm == 1].mean() > 2.0 * e01[rm == 0].mean()


def test_decimate_face_provenance():
    """return_src maps output faces to input faces (attribute carry-through)."""
    v, f = _icosphere(3)
    dv, df, src = meshops.decimate_mesh(v, f, 300, return_src=True)
    assert len(src) == len(df)
    assert src.min() >= 0 and src.max() < len(f)
    # surviving faces descend from inputs on the same side of the sphere:
    # centroids of output face and its source face are close
    c_in = v[f].mean(1)[src]
    c_out = dv[df].mean(1)
    d = np.linalg.norm(c_in - c_out, axis=-1)
    assert np.median(d) < 0.3


def test_decimate_and_refine_mask_semantics():
    """Reference semantics (meshutils.py:191-230): only mask==1 faces are
    decimated, mask==2 faces are subdivided (children inherit protection),
    mask==0 faces are left alone."""
    v, f = _icosphere(4)
    cm = v[f].mean(1)
    mask = np.zeros(len(f))
    mask[cm[:, 2] > 0.3] = 2          # subdivide the cap
    mask[cm[:, 2] < -0.3] = 1         # decimate the bottom
    n0 = int(((cm[:, 2] >= -0.3) & (cm[:, 2] <= 0.3)).sum())
    rv, rf = meshops.decimate_and_refine_mesh(
        v, f, mask, decimate_ratio=0.5, refine_size=0.01,
        refine_remesh_size=0.0)
    cm2 = rv[rf].mean(1)
    # cap got denser, bottom got sparser, belt roughly unchanged
    n_top_in = int((mask == 2).sum())
    n_bot_in = int((mask == 1).sum())
    n_top_out = int((cm2[:, 2] > 0.3).sum())
    n_bot_out = int((cm2[:, 2] < -0.3).sum())
    assert n_top_out > 2.5 * n_top_in, "subdivision region did not refine"
    assert n_bot_out < 0.75 * n_bot_in, "decimation region did not shrink"
    n_belt_out = int(((cm2[:, 2] >= -0.3) & (cm2[:, 2] <= 0.3)).sum())
    assert abs(n_belt_out - n0) < 0.35 * n0, "mask==0 belt was modified"
