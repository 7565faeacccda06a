"""DTU / IDR-format dataset provider (parity target: reference
nerf/dtu_provider.py).

cameras_sphere.npz holds world_mat_i (K[R|t]) and scale_mat_i (normalization);
P = (world_mat @ scale_mat)[:3,:4] is decomposed into K, R, t; poses then get
the same axis-convention rectification as the colmap provider
(dtu_provider.py:109-112), and mask/*.png become the alpha channel.
"""

from __future__ import annotations

import glob
import os

import numpy as np

from ..config import Config
from .provider import Dataset, _slerp
from .rays import make_projection, nerf_matrix_to_ngp


def decompose_projection(P: np.ndarray):
    """K, R, t from a 3x4 projection (cv2.decomposeProjectionMatrix analog
    via RQ decomposition; dtu_provider.py:49-63)."""
    M = P[:3, :3]
    # RQ decomposition through flipped QR
    Pf = np.flipud(M).T
    q, r = np.linalg.qr(Pf)
    K = np.flipud(r.T)[:, ::-1]
    R = np.flipud(q.T)
    # enforce positive diagonal of K
    signs = np.sign(np.diag(K))
    signs[signs == 0] = 1
    K = K * signs[None, :]
    R = R * signs[:, None]
    if np.linalg.det(R) < 0:
        R = -R
    t = np.linalg.lstsq(-M, P[:3, 3], rcond=None)[0]  # camera center
    K = K / K[2, 2]
    intrinsic = np.array([K[0, 0], K[1, 1], K[0, 2], K[1, 2]], np.float32)
    pose = np.eye(4, dtype=np.float32)
    pose[:3, :3] = R.T
    pose[:3, 3] = t
    return intrinsic, pose


def load_dtu_dataset(cfg: Config, split: str = "train",
                     n_test: int = 10) -> Dataset:
    from PIL import Image as PILImage

    root = cfg.path
    scale = 1.0 if cfg.scale == -1 else cfg.scale
    downscale = cfg.downscale
    training = split in ("train", "all", "trainval")

    cams = np.load(os.path.join(root, "cameras_sphere.npz"))
    image_paths = sorted(glob.glob(os.path.join(root, "image", "*.png")))
    mask_paths = sorted(glob.glob(os.path.join(root, "mask", "*.png")))

    intrinsics, poses = [], []
    for i in range(len(image_paths)):
        P = (cams[f"world_mat_{i}"] @ cams[f"scale_mat_{i}"])[:3, :4]
        intr, pose = decompose_projection(P)
        pose = nerf_matrix_to_ngp(pose, scale=scale, offset=cfg.offset)
        intrinsics.append(intr / downscale)
        poses.append(pose)
    intrinsics = np.stack(intrinsics).astype(np.float32)
    poses = np.stack(poses).astype(np.float64)

    # axis rectification (dtu_provider.py:109-112)
    poses[:, :3, 1:3] *= -1
    poses = poses[:, [1, 0, 2, 3], :]
    poses[:, 2] *= -1
    poses = poses.astype(np.float32)

    images = None
    H = W = None
    if split == "test":
        traj = []
        rng = np.random.default_rng(0)
        fs = rng.choice(len(poses), min(2, len(poses)), replace=False)
        p0, p1 = poses[fs[0]], poses[fs[-1]]
        for i in range(n_test + 1):
            ratio = np.sin(((i / n_test) - 0.5) * np.pi) * 0.5 + 0.5
            pose = np.eye(4, dtype=np.float32)
            pose[:3, :3] = _slerp(p0[:3, :3], p1[:3, :3], ratio)
            pose[:3, 3] = (1 - ratio) * p0[:3, 3] + ratio * p1[:3, 3]
            traj.append(pose)
        img0 = np.asarray(PILImage.open(image_paths[0]))
        H, W = img0.shape[0] // downscale, img0.shape[1] // downscale
        poses = np.stack(traj)
        intrinsics = np.tile(intrinsics[:1], (len(poses), 1))
    else:
        ids = np.arange(len(image_paths))
        val_ids = ids[::8]
        if split == "train":
            sel = np.array([i for i in ids if i not in val_ids])
        elif split == "val":
            sel = val_ids
        else:
            sel = ids
        poses = poses[sel]
        intrinsics = intrinsics[sel]
        imgs = []
        for i in sel:
            img = np.asarray(PILImage.open(image_paths[i]))[..., :3]
            if H is None:
                H, W = img.shape[0] // downscale, img.shape[1] // downscale
            if i < len(mask_paths) and os.path.exists(mask_paths[i]):
                m = np.asarray(PILImage.open(mask_paths[i]))
                if m.ndim == 3:
                    m = m[..., 0]
                img = np.concatenate([img, m[..., None]], -1)
            if img.shape[0] != H or img.shape[1] != W:
                img = np.asarray(PILImage.fromarray(img).resize((W, H)))
            imgs.append(img.astype(np.uint8))
        images = np.stack(imgs)

    projections = np.stack([
        make_projection(H, W, float(i[1]), cfg.min_near) for i in intrinsics])
    mvps = np.einsum("nij,njk->nik",
                     projections, np.linalg.inv(poses)).astype(np.float32)

    return Dataset(
        poses=poses, images=images, intrinsics=intrinsics, H=H, W=W,
        projection=projections[0], mvps=mvps, training=training,
    )
