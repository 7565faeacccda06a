"""--vis_pose: camera/point sanity visualization (headless).

The reference pops an interactive trimesh scene of camera frusta + the
bound box (+ sparse points for colmap) via `visualize_poses`
(nerf/provider.py:18-46,244; nerf/colmap_provider.py:33-61,466).  There
is no display in a TPU training job, so this writes the same geometry to
`<workspace>/poses.ply` (line segments as thin boxes are overkill — we
emit a point cloud: frustum corner/axis samples per camera, the bound
box edges, and any sparse points) plus a quick matplotlib PNG projection
when matplotlib is importable.
"""

from __future__ import annotations

import os

import numpy as np


def _frustum_points(pose: np.ndarray, size: float = 0.1, n: int = 8):
    """Sampled segment points of one camera frustum (provider.py:24-39)."""
    pos = pose[:3, 3]
    a = pos + size * pose[:3, 0] + size * pose[:3, 1] - size * pose[:3, 2]
    b = pos - size * pose[:3, 0] + size * pose[:3, 1] - size * pose[:3, 2]
    c = pos - size * pose[:3, 0] - size * pose[:3, 1] - size * pose[:3, 2]
    d = pos + size * pose[:3, 0] - size * pose[:3, 1] - size * pose[:3, 2]
    t = np.linspace(0.0, 1.0, n)[:, None]
    segs = []
    for p, q in [(pos, a), (pos, b), (pos, c), (pos, d),
                 (a, b), (b, c), (c, d), (d, a)]:
        segs.append(p[None] * (1 - t) + q[None] * t)
    return np.concatenate(segs, 0)


def _box_points(bound: float, n: int = 16):
    t = np.linspace(-bound, bound, n)
    pts = []
    for u in (-bound, bound):
        for v in (-bound, bound):
            pts += [np.stack([t, np.full_like(t, u), np.full_like(t, v)], -1),
                    np.stack([np.full_like(t, u), t, np.full_like(t, v)], -1),
                    np.stack([np.full_like(t, u), np.full_like(t, v), t], -1)]
    return np.concatenate(pts, 0)


def write_pose_vis(workspace: str, poses: np.ndarray, bound: float,
                   points: np.ndarray = None) -> str:
    """poses [B,4,4] cam2world; points optional [M,3] sparse cloud."""
    chunks = [(_box_points(bound), (255, 255, 0))]
    for p in np.asarray(poses):
        chunks.append((_frustum_points(np.asarray(p)), (0, 255, 0)))
    if points is not None and len(points):
        sub = np.asarray(points)[:: max(1, len(points) // 20000)]
        chunks.append((sub, (180, 180, 255)))

    xyz = np.concatenate([c[0] for c in chunks], 0).astype(np.float32)
    rgb = np.concatenate(
        [np.tile(np.asarray(c[1], np.uint8), (len(c[0]), 1)) for c in chunks], 0)

    path = os.path.join(workspace, "poses.ply")
    os.makedirs(workspace, exist_ok=True)
    with open(path, "wb") as f:
        f.write(
            (f"ply\nformat binary_little_endian 1.0\n"
             f"element vertex {len(xyz)}\n"
             "property float x\nproperty float y\nproperty float z\n"
             "property uchar red\nproperty uchar green\nproperty uchar blue\n"
             "end_header\n").encode())
        rec = np.zeros(len(xyz), dtype=[("xyz", np.float32, 3),
                                        ("rgb", np.uint8, 3)])
        rec["xyz"] = xyz
        rec["rgb"] = rgb
        f.write(rec.tobytes())

    try:
        import matplotlib
        matplotlib.use("Agg")
        import matplotlib.pyplot as plt
        fig = plt.figure(figsize=(8, 8))
        ax = fig.add_subplot(projection="3d")
        ax.scatter(xyz[:, 0], xyz[:, 1], xyz[:, 2], c=rgb / 255.0, s=1)
        ax.set_box_aspect((1, 1, 1))
        png = os.path.join(workspace, "poses.png")
        fig.savefig(png, dpi=110)
        plt.close(fig)
    except Exception:
        pass
    return path
