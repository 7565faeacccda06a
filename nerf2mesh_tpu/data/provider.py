"""NeRF-synthetic / blender dataset provider.

Parity target: reference nerf/provider.py:93-340 (NeRFDataset) — transforms
json auto-detection (colmap single-file vs blender split files), alpha/mask
channel loading, intrinsics resolution, MVP construction for stage 1,
slerp-interpolated test trajectory for colmap-mode json.

TPU-native difference: instead of a torch DataLoader yielding per-step host
batches, the provider materializes all images/poses as device-ready numpy
arrays once; per-step ray/pixel *sampling runs inside the jitted train step*
(see utils/trainer.py), so there is no host<->device transfer in the hot loop
(the reference's --preload, provider.py:330-340, made all-GPU residency an
option — here it is the design).
"""

from __future__ import annotations

import glob
import json
import os
from dataclasses import dataclass
from typing import List, Optional

import numpy as np

from ..config import Config
from .rays import create_dodecahedron_cameras, make_mvps, make_projection, nerf_matrix_to_ngp


def _slerp(R0: np.ndarray, R1: np.ndarray, t: float) -> np.ndarray:
    from scipy.spatial.transform import Rotation, Slerp
    rots = Rotation.from_matrix(np.stack([R0, R1]))
    return Slerp([0, 1], rots)(t).as_matrix()


@dataclass
class Dataset:
    """In-memory dataset; all arrays are host numpy, ready for device_put."""
    poses: np.ndarray                 # [B, 4, 4] cam2world, float32
    images: Optional[np.ndarray]      # [B, H, W, C] uint8 or None (test traj)
    intrinsics: np.ndarray            # [4] fx fy cx cy
    H: int
    W: int
    projection: np.ndarray            # [4, 4]
    mvps: np.ndarray                  # [B, 4, 4]
    training: bool
    cam_near_far: Optional[np.ndarray] = None   # [B, 2] or None

    @property
    def num_frames(self) -> int:
        return self.poses.shape[0]

    def intrinsics_for(self, i: int) -> np.ndarray:
        """Per-frame (fx, fy, cx, cy); intrinsics may be [4] or [N, 4]."""
        intr = np.asarray(self.intrinsics)
        return intr[i] if intr.ndim == 2 else intr

    @property
    def has_gt(self) -> bool:
        return self.images is not None

    @property
    def dodecahedron_mvps(self) -> np.ndarray:
        poses = create_dodecahedron_cameras()
        return make_mvps(self.projection, poses)


def load_nerf_dataset(cfg: Config, split: str = "train", n_test: int = 10) -> Dataset:
    """Load a nerf-synthetic / blender (or single-transforms colmap-style) dir."""
    try:
        import cv2
    except ImportError:
        cv2 = None
    from PIL import Image

    root = cfg.path
    scale = 1.0 if cfg.scale == -1 else cfg.scale
    offset = cfg.offset
    downscale = cfg.downscale
    training = split in ("train", "all", "trainval")

    if os.path.exists(os.path.join(root, "transforms.json")):
        mode = "colmap"
        with open(os.path.join(root, "transforms.json")) as f:
            transform = json.load(f)
    elif os.path.exists(os.path.join(root, "transforms_train.json")):
        mode = "blender"
        if split == "all":
            transform = None
            for p in sorted(glob.glob(os.path.join(root, "transforms_*.json"))):
                with open(p) as f:
                    t = json.load(f)
                if transform is None:
                    transform = t
                else:
                    transform["frames"].extend(t["frames"])
        elif split == "trainval":
            with open(os.path.join(root, "transforms_train.json")) as f:
                transform = json.load(f)
            with open(os.path.join(root, "transforms_val.json")) as f:
                transform["frames"].extend(json.load(f)["frames"])
        else:
            with open(os.path.join(root, f"transforms_{split}.json")) as f:
                transform = json.load(f)
    else:
        raise FileNotFoundError(f"no transforms*.json under {root}")

    H = int(transform["h"]) // downscale if "h" in transform else None
    W = int(transform["w"]) // downscale if "w" in transform else None

    frames = transform["frames"]

    poses: List[np.ndarray] = []
    images: Optional[List[np.ndarray]] = []

    if mode == "colmap" and split == "test":
        # slerp between two poses (provider.py:168-184)
        rng = np.random.default_rng(0)
        f0, f1 = rng.choice(len(frames), 2, replace=False)
        p0 = nerf_matrix_to_ngp(np.array(frames[f0]["transform_matrix"], np.float32), scale, offset)
        p1 = nerf_matrix_to_ngp(np.array(frames[f1]["transform_matrix"], np.float32), scale, offset)
        images = None
        for i in range(n_test + 1):
            ratio = np.sin(((i / n_test) - 0.5) * np.pi) * 0.5 + 0.5
            pose = np.eye(4, dtype=np.float32)
            pose[:3, :3] = _slerp(p0[:3, :3], p1[:3, :3], ratio)
            pose[:3, 3] = (1 - ratio) * p0[:3, 3] + ratio * p1[:3, 3]
            poses.append(pose)
        if H is None:
            f_path = os.path.join(root, frames[0]["file_path"])
            img = np.asarray(Image.open(f_path))
            H, W = img.shape[0] // downscale, img.shape[1] // downscale
    else:
        if mode == "colmap":
            if split == "train":
                frames = frames[1:]
            elif split == "val":
                frames = frames[:1]
        for fr in frames:
            f_path = os.path.join(root, fr["file_path"])
            if mode == "blender" and "." not in os.path.basename(f_path):
                f_path += ".png"
            if not os.path.exists(f_path):
                continue
            pose = nerf_matrix_to_ngp(
                np.array(fr["transform_matrix"], np.float32), scale, offset
            )
            img = np.asarray(Image.open(f_path))
            if img.ndim == 2:
                img = img[..., None].repeat(3, axis=-1)
            if H is None:
                H, W = img.shape[0] // downscale, img.shape[1] // downscale
            # optional mask dir as alpha (provider.py:223-227)
            m_path = f_path.replace("images", "mask")
            if m_path != f_path and os.path.exists(m_path):
                mask = np.asarray(Image.open(m_path))
                if mask.ndim == 2:
                    mask = mask[..., None]
                img = np.concatenate([img[..., :3], mask[..., :1]], axis=-1)
            if img.shape[0] != H or img.shape[1] != W:
                if cv2 is not None:
                    img = cv2.resize(img, (W, H), interpolation=cv2.INTER_AREA)
                else:
                    img = np.asarray(Image.fromarray(img).resize((W, H)))
            poses.append(pose)
            images.append(img.astype(np.uint8))

    poses_arr = np.stack(poses).astype(np.float32)
    images_arr = np.stack(images).astype(np.uint8) if images else None

    # intrinsics (provider.py:247-261)
    if "fl_x" in transform or "fl_y" in transform:
        fl_x = transform.get("fl_x", transform.get("fl_y")) / downscale
        fl_y = transform.get("fl_y", transform.get("fl_x")) / downscale
    elif "camera_angle_x" in transform or "camera_angle_y" in transform:
        fl_x = W / (2 * np.tan(transform["camera_angle_x"] / 2)) if "camera_angle_x" in transform else None
        fl_y = H / (2 * np.tan(transform["camera_angle_y"] / 2)) if "camera_angle_y" in transform else None
        fl_x = fl_x if fl_x is not None else fl_y
        fl_y = fl_y if fl_y is not None else fl_x
    else:
        raise RuntimeError("no focal length in transforms json")
    cx = transform.get("cx", W / 2.0) / (downscale if "cx" in transform else 1)
    cy = transform.get("cy", H / 2.0) / (downscale if "cy" in transform else 1)
    intrinsics = np.array([fl_x, fl_y, cx, cy], np.float32)

    projection = make_projection(H, W, fl_y, cfg.min_near)
    mvps = make_mvps(projection, poses_arr)

    return Dataset(
        poses=poses_arr, images=images_arr, intrinsics=intrinsics,
        H=H, W=W, projection=projection, mvps=mvps, training=training,
    )
