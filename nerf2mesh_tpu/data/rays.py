"""Camera and ray math (JAX).

Conventions follow the reference exactly (they are the subtle part — SURVEY.md §7):
  * pixel -> camera ray uses an OpenGL-ish frame with z and y flipped
    (reference nerf/utils.py:282-288): dir_cam = [(i-cx)/fx, -(j-cy)/fy, -1],
    sampled at pixel centers (i+0.5, j+0.5), NOT normalized (so composited
    "depth" is along -z, giving actual depth).
  * poses are cam2world [4, 4]; rays_d = dir_cam @ R^T, rays_o = t.
  * the stage-1 MVP is projection @ inv(pose) with the reference's projection
    matrix (nerf/provider.py:265-276).
"""

from __future__ import annotations

import numpy as np
import jax
import jax.numpy as jnp


def safe_normalize(x, eps: float = 1e-20):
    return x * jax.lax.rsqrt(jnp.clip(jnp.sum(x * x, -1, keepdims=True), eps, None))


def linear_to_srgb(x):
    return jnp.where(x < 0.0031308, 12.92 * x, 1.055 * jnp.clip(x, 1e-9, None) ** 0.41666 - 0.055)


def srgb_to_linear(x):
    return jnp.where(x < 0.04045, x / 12.92, ((x + 0.055) / 1.055) ** 2.4)


def pixel_dirs_cam(i, j, intrinsics):
    """Camera-space (unnormalized) ray directions for pixel centers.

    i: [N] column index (x), j: [N] row index (y), both float (already +0.5).
    intrinsics: (fx, fy, cx, cy) scalars or [N]-arrays.
    """
    fx, fy, cx, cy = intrinsics
    xs = (i - cx) / fx
    ys = -(j - cy) / fy
    zs = -jnp.ones_like(i)
    return jnp.stack([xs, ys, zs], axis=-1)


def get_rays(poses, intrinsics, H: int, W: int, indices=None):
    """Generate world-space rays.

    poses: [B, 4, 4] cam2world (B == N when indices picks a pose per ray).
    intrinsics: tuple of 4 scalars (fx, fy, cx, cy).
    indices: optional [N] flattened pixel indices (row-major, idx = j * W + i).
      If None, rays for the full H*W image are returned (poses must be [1,4,4]).

    Returns dict with rays_o [N,3], rays_d [N,3], and (if indices) i, j [N] int32.
    """
    if indices is None:
        idx = jnp.arange(H * W)
    else:
        idx = indices
    jj = (idx // W).astype(jnp.float32) + 0.5
    ii = (idx % W).astype(jnp.float32) + 0.5

    dirs = pixel_dirs_cam(ii, jj, intrinsics)  # [N, 3]

    # precision=HIGHEST: TPU matmuls default to bf16 inputs, which quantizes
    # ray directions to ~2^-9 (measured: up to 0.26 px of view-dependent warp
    # at 256^2).  Stage 0 then learns a warped field that stage 1's exact
    # rasterizer contradicts — the round-2 "±0.005 surface noise / ~1 px rim"
    # signature.  These 3x3 rotations are tiny; full fp32 is free.
    rot = poses[:, :3, :3]  # [B, 3, 3]
    if rot.shape[0] == 1:
        rays_d = jnp.einsum("nc,rc->nr", dirs, rot[0],
                            precision=jax.lax.Precision.HIGHEST)
        rays_o = jnp.broadcast_to(poses[0, :3, 3], rays_d.shape)
    else:
        rays_d = jnp.einsum("nc,nrc->nr", dirs, rot,
                            precision=jax.lax.Precision.HIGHEST)
        rays_o = poses[:, :3, 3]

    out = {"rays_o": rays_o, "rays_d": rays_d}
    if indices is not None:
        out["i"] = (idx % W).astype(jnp.int32)
        out["j"] = (idx // W).astype(jnp.int32)
    return out


def nerf_matrix_to_ngp(pose: np.ndarray, scale: float = 0.33, offset=(0, 0, 0)) -> np.ndarray:
    """Scale/offset camera centers into the scene box (reference provider.py:16-19)."""
    pose = np.array(pose, dtype=np.float32)
    pose[:3, 3] = pose[:3, 3] * scale + np.asarray(offset, dtype=np.float32)
    return pose


def make_projection(H: int, W: int, fl_y: float, near: float, far: float = 1000.0) -> np.ndarray:
    """Perspective projection matching the reference (provider.py:265-276)."""
    y = H / (2.0 * fl_y)
    aspect = W / H
    return np.array(
        [
            [1 / (y * aspect), 0, 0, 0],
            [0, -1 / y, 0, 0],
            [0, 0, -(far + near) / (far - near), -(2 * far * near) / (far - near)],
            [0, 0, -1, 0],
        ],
        dtype=np.float32,
    )


def make_mvps(projection: np.ndarray, poses: np.ndarray) -> np.ndarray:
    """MVP per camera: projection @ inv(cam2world)."""
    return np.einsum("ij,njk->nik", projection, np.linalg.inv(poses)).astype(np.float32)


def create_dodecahedron_cameras(radius: float = 1.0, center=np.zeros(3)) -> np.ndarray:
    """20 look-at cameras on dodecahedron vertices (reference utils.py:68-114),
    used for visibility culling when no dataset cameras are given."""
    vertices = np.array([
        -0.57735, -0.57735, 0.57735, 0.934172, 0.356822, 0, 0.934172, -0.356822, 0,
        -0.934172, 0.356822, 0, -0.934172, -0.356822, 0, 0, 0.934172, 0.356822,
        0, 0.934172, -0.356822, 0.356822, 0, -0.934172, -0.356822, 0, -0.934172,
        0, -0.934172, -0.356822, 0, -0.934172, 0.356822, 0.356822, 0, 0.934172,
        -0.356822, 0, 0.934172, 0.57735, 0.57735, -0.57735, 0.57735, 0.57735, 0.57735,
        -0.57735, 0.57735, -0.57735, -0.57735, 0.57735, 0.57735, 0.57735, -0.57735, -0.57735,
        0.57735, -0.57735, 0.57735, -0.57735, -0.57735, -0.57735,
    ]).reshape(-1, 3)
    vertices = vertices / np.linalg.norm(vertices, axis=1, keepdims=True) * radius + center

    def normalize(x):
        return x / (np.linalg.norm(x, axis=-1, keepdims=True) + 1e-8)

    forward = normalize(vertices - center)
    up = np.tile(np.array([0, 1, 0], dtype=np.float32), (forward.shape[0], 1))
    right = normalize(np.cross(up, forward, axis=-1))
    up = normalize(np.cross(forward, right, axis=-1))

    poses = np.tile(np.eye(4, dtype=np.float32), (forward.shape[0], 1, 1))
    poses[:, :3, :3] = np.stack((right, up, forward), axis=-1)
    poses[:, :3, 3] = vertices
    return poses.astype(np.float32)


def orbit_pose(theta: float, phi: float, radius: float) -> np.ndarray:
    """One orbit-camera cam2world pose looking at the origin.

    Convention matches create_dodecahedron_cameras (reference utils.py:100-110):
    the rotation's third column is the camera *backward* axis (away from the
    target), because get_rays uses dir_cam = [., ., -1].
    """
    center = np.array([
        radius * np.sin(theta) * np.sin(phi),
        radius * np.cos(theta),
        radius * np.sin(theta) * np.cos(phi),
    ], dtype=np.float32)

    def normalize(x):
        return x / (np.linalg.norm(x, axis=-1, keepdims=True) + 1e-8)

    backward = normalize(center)
    up = np.array([0, 1, 0], dtype=np.float32)
    right = normalize(np.cross(up, backward))
    up = normalize(np.cross(backward, right))
    pose = np.eye(4, dtype=np.float32)
    pose[:3, :3] = np.stack((right, up, backward), axis=-1)
    pose[:3, 3] = center
    return pose
