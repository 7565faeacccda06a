"""Mesh processing API (parity target: reference meshutils.py).

Backed by the native C++ library (nerf2mesh_tpu/native/meshops.cpp) — quadric
decimation and component cleaning — plus numpy implementations for the simple
operations (masked-face removal, box-predicate vertex removal, midpoint
subdivision).  The native library is (re)built on demand with `make`.
"""

from __future__ import annotations

import ctypes
import os
import subprocess
from typing import Optional, Tuple

import numpy as np

_NATIVE_DIR = os.path.join(os.path.dirname(__file__), "..", "native")
_LIB_PATH = os.path.join(_NATIVE_DIR, "libmeshops.so")
_lib = None


def _load():
    global _lib
    if _lib is not None:
        return _lib
    if not os.path.exists(_LIB_PATH):
        subprocess.run(["make", "-C", _NATIVE_DIR], check=True,
                       capture_output=True)
    lib = ctypes.CDLL(_LIB_PATH)
    pf = ctypes.POINTER(ctypes.c_float)
    pi = ctypes.POINTER(ctypes.c_int)
    lib.meshops_decimate.restype = ctypes.c_int
    lib.meshops_decimate.argtypes = [
        pf, ctypes.c_int, pi, ctypes.c_int, ctypes.c_int,
        ctypes.POINTER(ctypes.c_uint8),
        ctypes.POINTER(pf), pi, ctypes.POINTER(pi), pi,
    ]
    lib.meshops_clean.restype = ctypes.c_int
    lib.meshops_clean.argtypes = [
        pf, ctypes.c_int, pi, ctypes.c_int, ctypes.c_float, ctypes.c_int,
        ctypes.c_float,
        ctypes.POINTER(pf), pi, ctypes.POINTER(pi), pi,
    ]
    lib.meshops_free.argtypes = [ctypes.c_void_p]
    _lib = lib
    return lib


def _call_native(fn, verts, tris, *args):
    lib = _load()
    v = np.ascontiguousarray(verts, np.float32)
    f = np.ascontiguousarray(tris, np.int32)
    pf = ctypes.POINTER(ctypes.c_float)
    pi = ctypes.POINTER(ctypes.c_int)
    out_v, out_f = pf(), pi()
    out_nv, out_nf = ctypes.c_int(0), ctypes.c_int(0)
    rc = fn(
        v.ctypes.data_as(pf), len(v),
        f.ctypes.data_as(pi), len(f),
        *args,
        ctypes.byref(out_v), ctypes.byref(out_nv),
        ctypes.byref(out_f), ctypes.byref(out_nf),
    )
    assert rc == 0
    nv, nf = out_nv.value, out_nf.value
    rv = np.ctypeslib.as_array(out_v, shape=(nv, 3)).copy()
    rf = np.ctypeslib.as_array(out_f, shape=(nf, 3)).copy()
    lib.meshops_free(ctypes.cast(out_v, ctypes.c_void_p))
    lib.meshops_free(ctypes.cast(out_f, ctypes.c_void_p))
    return rv, rf


def decimate_mesh(verts: np.ndarray, tris: np.ndarray, target: float,
                  protect: Optional[np.ndarray] = None,
                  ) -> Tuple[np.ndarray, np.ndarray]:
    """Quadric edge-collapse to ~`target` faces (meshutils.py:27-60)."""
    lib = _load()
    if protect is not None:
        protect = np.ascontiguousarray(protect, np.uint8)
        pp = protect.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8))
    else:
        pp = ctypes.POINTER(ctypes.c_uint8)()
    return _call_native(lib.meshops_decimate, verts, tris,
                        ctypes.c_int(int(target)), pp)


def clean_mesh(verts: np.ndarray, tris: np.ndarray,
               v_pct: float = 1.0, min_f: int = 8, min_d: float = 5.0,
               repair: bool = True, remesh: bool = False,
               ) -> Tuple[np.ndarray, np.ndarray]:
    """Merge close vertices (v_pct% of bbox diag), drop degenerate/dup faces,
    remove small isolated components (meshutils.py:146-188)."""
    del repair, remesh  # non-manifold repair folded into dedup; no remesh here
    verts = np.asarray(verts, np.float32)
    if len(verts) == 0:
        return verts, np.asarray(tris, np.int32)
    diag = float(np.linalg.norm(verts.max(0) - verts.min(0)))
    eps = diag * v_pct / 10000.0
    lib = _load()
    return _call_native(lib.meshops_clean, verts, tris,
                        ctypes.c_float(eps), ctypes.c_int(min_f),
                        ctypes.c_float(min_d))


def remove_masked_trigs(verts: np.ndarray, tris: np.ndarray,
                        mask: np.ndarray, dilation: int = 5,
                        ) -> Tuple[np.ndarray, np.ndarray]:
    """Remove faces where mask!=0, after shrinking the masked set by `dilation`
    rings of face adjacency (meshutils.py:63-93 dilates the *selection* so
    borderline faces survive)."""
    mask = np.asarray(mask).astype(bool)
    keep = ~mask
    # dilate the keep set over vertex-adjacent faces `dilation` times
    for _ in range(dilation):
        kept_verts = np.zeros(len(verts), bool)
        kept_verts[tris[keep].reshape(-1)] = True
        keep = keep | kept_verts[tris].any(axis=1)
    v, f = verts, tris[keep]
    return _compact(v, f)


def remove_selected_verts(verts: np.ndarray, tris: np.ndarray,
                          predicate, ) -> Tuple[np.ndarray, np.ndarray]:
    """Remove vertices where predicate(verts) is True plus their faces
    (meshutils.py:122-144; the reference passes pymeshlab string expressions —
    here `predicate` is a callable or a boolean mask)."""
    if callable(predicate):
        sel = predicate(verts)
    else:
        sel = np.asarray(predicate, bool)
    face_sel = sel[tris].any(axis=1)
    return _compact(verts, tris[~face_sel])


def select_inside_box(r: float):
    """Predicate: |x|,|y|,|z| all <= r (used to carve cascade centers,
    renderer.py:637)."""
    return lambda v: np.all(np.abs(v) <= r, axis=-1)


def select_outside_box(aabb: np.ndarray):
    """Predicate: outside the [6] aabb (renderer.py:650)."""
    aabb = np.asarray(aabb)
    return lambda v: np.any((v <= aabb[:3]) | (v >= aabb[3:]), axis=-1)


def midpoint_subdivide(verts: np.ndarray, tris: np.ndarray,
                       face_mask: np.ndarray,
                       ) -> Tuple[np.ndarray, np.ndarray]:
    """1-to-4 midpoint subdivision of selected faces; neighbors of split edges
    are bisected to stay watertight (meshutils.py:191-230 refine path)."""
    verts = np.asarray(verts, np.float32)
    tris = np.asarray(tris, np.int64)
    face_mask = np.asarray(face_mask, bool)
    nv = len(verts)

    # collect split edges from selected faces
    sel = tris[face_mask]
    edges = np.concatenate([sel[:, [0, 1]], sel[:, [1, 2]], sel[:, [2, 0]]])
    edges = np.sort(edges, axis=1)
    ekey = edges[:, 0] * (nv + 1) + edges[:, 1]
    uniq_keys = np.unique(ekey)
    mid_of = {k: nv + i for i, k in enumerate(uniq_keys)}
    ua, ub = uniq_keys // (nv + 1), uniq_keys % (nv + 1)
    new_verts = 0.5 * (verts[ua] + verts[ub])
    all_verts = np.concatenate([verts, new_verts], axis=0)

    def mid(a, b):
        k = min(a, b) * (nv + 1) + max(a, b)
        return mid_of.get(k, -1)

    out = []
    for fi, (a, b, c) in enumerate(tris):
        mab, mbc, mca = mid(a, b), mid(b, c), mid(c, a)
        n_split = (mab >= 0) + (mbc >= 0) + (mca >= 0)
        if n_split == 0:
            out.append((a, b, c))
        elif n_split == 3:
            out += [(a, mab, mca), (mab, b, mbc), (mca, mbc, c), (mab, mbc, mca)]
        elif n_split == 1:
            if mab >= 0:
                out += [(a, mab, c), (mab, b, c)]
            elif mbc >= 0:
                out += [(b, mbc, a), (mbc, c, a)]
            else:
                out += [(c, mca, b), (mca, a, b)]
        else:  # 2 splits
            if mab < 0:
                out += [(c, mca, mbc), (mca, a, b), (mca, b, mbc)]
            elif mbc < 0:
                out += [(a, mab, mca), (mab, b, c), (mab, c, mca)]
            else:
                out += [(b, mbc, mab), (mbc, c, a), (mbc, a, mab)]
    return all_verts.astype(np.float32), np.asarray(out, np.int32)


def decimate_and_refine_mesh(verts: np.ndarray, tris: np.ndarray,
                             mask: np.ndarray,
                             decimate_ratio: float = 0.1,
                             refine_size: float = 0.01,
                             refine_remesh_size: float = 0.02,
                             ) -> Tuple[np.ndarray, np.ndarray]:
    """Adaptive refinement (meshutils.py:191-230): mask==1 faces are decimation
    candidates, mask==2 faces are subdivided when larger than refine_size."""
    verts = np.asarray(verts, np.float32)
    tris = np.asarray(tris, np.int32)
    mask = np.asarray(mask)

    # subdivide large high-error faces
    if refine_size > 0:
        e0 = np.linalg.norm(verts[tris[:, 0]] - verts[tris[:, 1]], axis=-1)
        e1 = np.linalg.norm(verts[tris[:, 1]] - verts[tris[:, 2]], axis=-1)
        e2 = np.linalg.norm(verts[tris[:, 2]] - verts[tris[:, 0]], axis=-1)
        big = np.maximum(np.maximum(e0, e1), e2) > refine_size
        to_split = (mask == 2) & big
        if to_split.any():
            old_nf = len(tris)
            protect_split = np.zeros(old_nf, bool)
            verts, tris = midpoint_subdivide(verts, tris, to_split)
            # mask no longer aligns after subdivision; rebuild: protect nothing
            mask = np.zeros(len(tris))

    # decimate low-error faces (protect high-error ones when mask still aligns)
    if decimate_ratio > 0 and len(tris) > 0:
        target = int(len(tris) * (1 - decimate_ratio))
        protect = None
        if len(mask) == len(tris):
            protect = (np.asarray(mask) == 2).astype(np.uint8)
        verts, tris = decimate_mesh(verts, tris, target, protect=protect)

    return clean_mesh(verts, tris, min_f=4, min_d=2.0)


def _compact(verts: np.ndarray, tris: np.ndarray):
    used, inv = np.unique(tris.reshape(-1), return_inverse=True)
    return (np.asarray(verts, np.float32)[used],
            inv.reshape(-1, 3).astype(np.int32))
