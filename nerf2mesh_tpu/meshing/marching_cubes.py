"""Isosurface extraction (replaces PyMCubes, reference renderer.py:523-525).

Implemented as vectorized numpy **marching tetrahedra**: each grid cell is
split into 6 tetrahedra; each tet contributes 0-2 triangles depending on its
corner signs.  Compared to classic marching cubes this produces ~2x more
triangles but has trivial case logic (no 256-entry tables), vectorizes fully,
and yields watertight, manifold-friendly output; the pipeline decimates
immediately afterwards anyway (renderer.py:540-541), so the extra triangles
are free.

Vertices are deduplicated exactly via global edge keys, so shared edges
produce shared vertices (watertightness).
"""

from __future__ import annotations

from typing import Tuple

import numpy as np

# 6-tetrahedra decomposition of the unit cube (corner ids 0..7 with bit order
# x=1, y=2, z=4); all tets share the main diagonal 0-7 -> consistent faces.
_TETS = np.array([
    [0, 5, 1, 7],
    [0, 1, 3, 7],
    [0, 3, 2, 7],
    [0, 2, 6, 7],
    [0, 6, 4, 7],
    [0, 4, 5, 7],
], dtype=np.int64)

_CORNER_OFFSET = np.array(
    [[(i >> 0) & 1, (i >> 1) & 1, (i >> 2) & 1] for i in range(8)],
    dtype=np.int64)

# per tet-case triangle list in terms of tet-edge ids.
# tet edges: 0:(0,1) 1:(0,2) 2:(0,3) 3:(1,2) 4:(1,3) 5:(2,3)
_TET_EDGES = np.array([(0, 1), (0, 2), (0, 3), (1, 2), (1, 3), (2, 3)],
                      dtype=np.int64)

# case = bitmask of corners with value > level ("inside").
# triangles oriented so normals point away from the inside region.
_TET_TRIS = {
    0x0: [], 0xF: [],
    0x1: [(0, 1, 2)],
    0x2: [(0, 4, 3)],
    0x3: [(1, 2, 4), (1, 4, 3)],
    0x4: [(1, 3, 5)],
    0x5: [(0, 3, 5), (0, 5, 2)],
    0x6: [(0, 4, 5), (0, 5, 1)],
    0x7: [(2, 4, 5)],
    0x8: [(2, 5, 4)],
    0x9: [(0, 5, 4), (0, 1, 5)],
    0xA: [(0, 5, 3), (0, 2, 5)],
    0xB: [(1, 5, 3)],
    0xC: [(1, 4, 2), (1, 3, 4)],
    0xD: [(0, 3, 4)],
    0xE: [(0, 2, 1)],
}


def marching_cubes(field: np.ndarray, level: float = 0.0,
                   ) -> Tuple[np.ndarray, np.ndarray]:
    """Extract the isosurface field == level.

    field: [X, Y, Z] scalar grid.  Returns (vertices [N, 3] in grid-index
    coordinates, triangles [M, 3] int32), like mcubes.marching_cubes.
    Surface normals point toward decreasing field (outside) when the inside
    is field > level.
    """
    field = np.asarray(field, np.float32)
    X, Y, Z = field.shape
    if min(X, Y, Z) < 2:
        return np.zeros((0, 3), np.float32), np.zeros((0, 3), np.int32)

    # cell origin coordinates
    cx, cy, cz = np.meshgrid(np.arange(X - 1), np.arange(Y - 1),
                             np.arange(Z - 1), indexing="ij")
    cell = np.stack([cx.ravel(), cy.ravel(), cz.ravel()], axis=-1)  # [C, 3]

    # corner values [C, 8]
    vals = np.empty((cell.shape[0], 8), np.float32)
    for i, (ox, oy, oz) in enumerate(_CORNER_OFFSET):
        vals[:, i] = field[cx + ox, cy + oy, cz + oz].ravel()
    inside = vals > level                                            # [C, 8]

    # quickly drop cells fully inside/outside
    any_in = inside.any(axis=1)
    all_in = inside.all(axis=1)
    active = any_in & ~all_in
    cell = cell[active]
    vals = vals[active]
    inside = inside[active]
    C = cell.shape[0]
    if C == 0:
        return np.zeros((0, 3), np.float32), np.zeros((0, 3), np.int32)

    # global corner ids for dedup: corner at integer coords (x, y, z)
    def corner_gid(corner_xyz):
        return (corner_xyz[:, 0] * Y + corner_xyz[:, 1]) * Z + corner_xyz[:, 2]

    tris_edges = []           # list of ([K] edge-key-a, edge-key-b, frac?) ...
    edge_a_all, edge_b_all, tri_rows = [], [], []

    for t in range(6):
        tc = _TETS[t]                                               # 4 corner ids
        tin = inside[:, tc]                                         # [C, 4]
        case = (tin[:, 0].astype(np.int64) | (tin[:, 1] << 1)
                | (tin[:, 2] << 2) | (tin[:, 3] << 3))
        for cs in range(1, 15):
            rows = np.nonzero(case == cs)[0]
            if rows.size == 0:
                continue
            for tri in _TET_TRIS[cs]:
                # each tri = 3 tet-edge ids; emit (cellrow, corner_a, corner_b)
                e3a = np.empty((rows.size, 3), np.int64)
                e3b = np.empty((rows.size, 3), np.int64)
                for k, e in enumerate(tri):
                    ca, cb = _TET_EDGES[e]
                    ca, cb = tc[ca], tc[cb]
                    gxa = cell[rows] + _CORNER_OFFSET[ca]
                    gxb = cell[rows] + _CORNER_OFFSET[cb]
                    ga, gb = corner_gid(gxa), corner_gid(gxb)
                    # canonical edge order
                    swap = ga > gb
                    e3a[:, k] = np.where(swap, gb, ga)
                    e3b[:, k] = np.where(swap, ga, gb)
                edge_a_all.append(e3a)
                edge_b_all.append(e3b)

    if not edge_a_all:
        return np.zeros((0, 3), np.float32), np.zeros((0, 3), np.int32)

    ea = np.concatenate(edge_a_all, axis=0)                          # [T, 3]
    eb = np.concatenate(edge_b_all, axis=0)

    # dedup edge vertices
    nmax = X * Y * Z
    ekey = ea.astype(np.int64) * nmax + eb.astype(np.int64)
    uniq, inv = np.unique(ekey.ravel(), return_inverse=True)
    tris = inv.reshape(-1, 3).astype(np.int32)

    ua = (uniq // nmax).astype(np.int64)
    ub = (uniq % nmax).astype(np.int64)

    def gid_to_xyz(g):
        z = g % Z
        y = (g // Z) % Y
        x = g // (Y * Z)
        return np.stack([x, y, z], axis=-1).astype(np.float32)

    pa, pb = gid_to_xyz(ua), gid_to_xyz(ub)
    va = field[ua // (Y * Z), (ua // Z) % Y, ua % Z]
    vb = field[ub // (Y * Z), (ub // Z) % Y, ub % Z]
    denom = vb - va
    frac = np.where(np.abs(denom) > 1e-12, (level - va) / np.where(
        np.abs(denom) > 1e-12, denom, 1.0), 0.5)
    frac = np.clip(frac, 0.0, 1.0)
    verts = pa + frac[:, None] * (pb - pa)

    # drop degenerate triangles (two corners on same vertex)
    ok = ((tris[:, 0] != tris[:, 1]) & (tris[:, 1] != tris[:, 2])
          & (tris[:, 0] != tris[:, 2]))
    return verts.astype(np.float32), tris[ok]
