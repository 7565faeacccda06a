"""Procedural synthetic dataset generator (nerf-synthetic format).

No datasets ship with this environment, so tests, benchmarks and e2e smoke
training use scenes rendered analytically here: diffuse spheres + a box,
simple directional shading, alpha channel, cameras on an orbit — written to
disk as transforms_{split}.json + PNGs exactly like the blender/nerf-synthetic
layout the provider consumes (reference nerf/provider.py:120-146).
"""

from __future__ import annotations

import json
import os
from dataclasses import dataclass, field
from typing import List, Tuple

import numpy as np

from .rays import orbit_pose


@dataclass
class SphereScene:
    """A few diffuse spheres; analytic ray-traced ground truth."""
    centers: np.ndarray = field(default_factory=lambda: np.array(
        [[0.0, 0.0, 0.0], [0.35, 0.25, 0.3], [-0.4, -0.1, 0.25]], np.float32))
    radii: np.ndarray = field(default_factory=lambda: np.array(
        [0.42, 0.22, 0.18], np.float32))
    colors: np.ndarray = field(default_factory=lambda: np.array(
        [[0.85, 0.25, 0.2], [0.2, 0.6, 0.9], [0.9, 0.8, 0.2]], np.float32))
    light_dir: np.ndarray = field(default_factory=lambda: np.array(
        [0.5, 0.8, 0.3], np.float32))

    def trace(self, rays_o: np.ndarray, rays_d: np.ndarray) -> Tuple[np.ndarray, np.ndarray]:
        """Returns rgb [N,3] in [0,1] and alpha [N]."""
        N = rays_o.shape[0]
        d = rays_d / np.linalg.norm(rays_d, axis=-1, keepdims=True)
        best_t = np.full(N, np.inf, np.float32)
        rgb = np.zeros((N, 3), np.float32)
        alpha = np.zeros(N, np.float32)
        L = self.light_dir / np.linalg.norm(self.light_dir)
        for c, r, col in zip(self.centers, self.radii, self.colors):
            oc = rays_o - c
            b = np.sum(oc * d, -1)
            cc = np.sum(oc * oc, -1) - r * r
            disc = b * b - cc
            hit = disc > 0
            t = -b - np.sqrt(np.maximum(disc, 0))
            hit &= (t > 0) & (t < best_t)
            if not hit.any():
                continue
            p = rays_o[hit] + t[hit, None] * d[hit]
            n = (p - c) / r
            lam = np.clip(n @ L, 0, 1) * 0.8 + 0.2
            rgb[hit] = col[None, :] * lam[:, None]
            alpha[hit] = 1.0
            best_t[hit] = t[hit]
        return rgb, alpha

    def sdf(self, pts: np.ndarray) -> np.ndarray:
        """Analytic SDF (for meshing tests)."""
        d = np.full(pts.shape[0], np.inf, np.float32)
        for c, r in zip(self.centers, self.radii):
            d = np.minimum(d, np.linalg.norm(pts - c, axis=-1) - r)
        return d


def _camera_rays(pose: np.ndarray, H: int, W: int, fl: float):
    j, i = np.meshgrid(np.arange(H), np.arange(W), indexing="ij")
    x = (i.reshape(-1) + 0.5 - W / 2) / fl
    y = -(j.reshape(-1) + 0.5 - H / 2) / fl
    dirs = np.stack([x, y, -np.ones_like(x)], -1).astype(np.float32)
    rays_d = dirs @ pose[:3, :3].T
    rays_o = np.broadcast_to(pose[:3, 3], rays_d.shape)
    return rays_o, rays_d


def generate_synthetic_dataset(
    root: str,
    scene: SphereScene | None = None,
    H: int = 128,
    W: int = 128,
    n_train: int = 32,
    n_val: int = 4,
    n_test: int = 8,
    fovx_deg: float = 45.0,
    radius: float = 2.8,
    seed: int = 0,
) -> str:
    """Write a nerf-synthetic-format dataset under `root`. Returns root."""
    try:
        import cv2
    except ImportError:  # pragma: no cover
        cv2 = None
    from PIL import Image

    scene = scene or SphereScene()
    os.makedirs(root, exist_ok=True)
    rng = np.random.default_rng(seed)
    camera_angle_x = np.deg2rad(fovx_deg)
    fl = W / (2 * np.tan(camera_angle_x / 2))

    splits = {"train": n_train, "val": n_val, "test": n_test}
    for split, n in splits.items():
        frames = []
        img_dir = os.path.join(root, split)
        os.makedirs(img_dir, exist_ok=True)
        for k in range(n):
            if split == "train":
                theta = np.arccos(rng.uniform(0.05, 0.95))
                phi = rng.uniform(0, 2 * np.pi)
            else:
                theta = np.pi / 3
                phi = 2 * np.pi * k / n
            pose = orbit_pose(theta, phi, radius)
            rays_o, rays_d = _camera_rays(pose, H, W, fl)
            rgb, alpha = scene.trace(rays_o, rays_d)
            img = np.concatenate([rgb, alpha[:, None]], -1).reshape(H, W, 4)
            img8 = (np.clip(img, 0, 1) * 255).astype(np.uint8)
            fname = f"./{split}/r_{k}"
            Image.fromarray(img8, "RGBA").save(os.path.join(root, fname[2:] + ".png"))
            frames.append({
                "file_path": fname,
                "transform_matrix": pose.tolist(),
            })
        with open(os.path.join(root, f"transforms_{split}.json"), "w") as f:
            json.dump({"camera_angle_x": float(camera_angle_x), "frames": frames}, f)
    return root
