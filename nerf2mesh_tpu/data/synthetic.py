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
from typing import Tuple

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

    env_radius: float = 0.0   # >0: enclose the scene in a textured sphere

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
        if self.env_radius > 0:
            # background = inside of an enclosing sphere with a smooth pattern
            # (gives colmap-style captures real geometry on every ray)
            miss = ~np.isfinite(best_t)
            if miss.any():
                b = np.sum(rays_o[miss] * d[miss], -1)
                cc = np.sum(rays_o[miss] ** 2, -1) - self.env_radius ** 2
                t = -b + np.sqrt(np.maximum(b * b - cc, 0))
                p = rays_o[miss] + t[:, None] * d[miss]
                n = p / self.env_radius
                rgb[miss] = 0.5 + 0.35 * np.stack([
                    np.sin(3 * n[:, 0]) * np.cos(2 * n[:, 1]),
                    np.sin(4 * n[:, 1]),
                    np.cos(3 * n[:, 2])], -1)
                alpha[miss] = 1.0
        return rgb, alpha

    def sdf(self, pts: np.ndarray) -> np.ndarray:
        """Analytic SDF (for meshing tests)."""
        d = np.full(pts.shape[0], np.inf, np.float32)
        for c, r in zip(self.centers, self.radii):
            d = np.minimum(d, np.linalg.norm(pts - c, axis=-1) - r)
        return d


@dataclass
class HardScene:
    """Lego-proxy benchmark scene: textured boxes, thin rods, and glossy
    (view-dependent) materials, raytraced analytically.

    The real benchmark datasets (nerf-synthetic lego etc., BASELINE.json)
    cannot be fetched in this environment (no egress — DNS resolution fails
    for all hosts; attempt documented in BASELINE.md).  This scene is the
    closest procedural stand-in: high-frequency checker textures stress the
    fine hash levels, 0.015-radius rods stress thin-structure sampling, and
    Blinn-Phong speculars exercise the view-dependent head.  Quality numbers
    on it are labeled 'hard-proxy', never compared 1:1 with published lego.
    """
    light_dir: np.ndarray = field(default_factory=lambda: np.array(
        [0.4, 0.9, 0.35], np.float32))
    seed: int = 7

    def __post_init__(self):
        rng = np.random.default_rng(self.seed)
        # boxes: (center, half-extent, yaw, base color, gloss)
        self.boxes = [
            (np.array([0.0, -0.42, 0.0]), np.array([0.58, 0.06, 0.58]),
             0.0, np.array([0.55, 0.52, 0.5]), 0.15),          # base plate
            (np.array([-0.22, -0.18, 0.1]), np.array([0.2, 0.18, 0.26]),
             0.4, np.array([0.8, 0.25, 0.15]), 0.5),
            (np.array([0.26, -0.24, -0.14]), np.array([0.16, 0.12, 0.2]),
             -0.3, np.array([0.95, 0.75, 0.1]), 0.7),
            (np.array([0.18, 0.02, 0.22]), np.array([0.12, 0.14, 0.1]),
             0.9, np.array([0.2, 0.45, 0.85]), 0.9),
        ]
        # thin rods: (base, axis unit, length, radius, color)
        self.rods = []
        for i in range(6):
            a = rng.normal(size=3)
            a[1] = abs(a[1]) + 1.2
            a /= np.linalg.norm(a)
            base = np.array([rng.uniform(-0.4, 0.4), -0.36,
                             rng.uniform(-0.4, 0.4)])
            self.rods.append((base.astype(np.float32), a.astype(np.float32),
                              rng.uniform(0.35, 0.7), 0.015,
                              np.array([0.15, 0.8, 0.4], np.float32)))
        # one glossy sphere
        self.sph = (np.array([-0.05, 0.18, -0.2], np.float32), 0.14,
                    np.array([0.9, 0.9, 0.95], np.float32))

    @staticmethod
    def _rot(yaw):
        c, s = np.cos(yaw), np.sin(yaw)
        return np.array([[c, 0, s], [0, 1, 0], [-s, 0, c]], np.float32)

    def _albedo(self, p, base, kind):
        """High-frequency procedural texture (stresses fine hash levels)."""
        if kind == 0:   # checker at 24 cells/unit
            par = np.floor(p * 24.0).astype(np.int64).sum(-1) % 2
            return base * (0.45 + 0.55 * par)[:, None]
        if kind == 1:   # stripes + noise-ish modulation
            m = 0.5 + 0.5 * np.sin(40.0 * p[:, 0] + 17.0 * p[:, 2])
            return base * (0.5 + 0.5 * m)[:, None]
        return np.broadcast_to(base, p.shape).copy()

    def trace(self, rays_o: np.ndarray, rays_d: np.ndarray):
        N = rays_o.shape[0]
        d = rays_d / np.linalg.norm(rays_d, axis=-1, keepdims=True)
        best_t = np.full(N, np.inf, np.float32)
        nrm = np.zeros((N, 3), np.float32)
        alb = np.zeros((N, 3), np.float32)
        gloss = np.zeros(N, np.float32)
        tex = np.zeros(N, np.int64)

        def consider(t, hit, n, base, g, kind):
            upd = hit & (t > 1e-3) & (t < best_t)
            if not upd.any():
                return
            best_t[upd] = t[upd]
            nrm[upd] = n[upd]
            alb[upd] = np.broadcast_to(base, (N, 3))[upd]
            gloss[upd] = g
            tex[upd] = kind

        for k, (c, h, yaw, col, g) in enumerate(self.boxes):
            R = self._rot(yaw)
            ol = (rays_o - c) @ R
            dl = d @ R
            dl = np.where(np.abs(dl) < 1e-9, 1e-9, dl)
            t0 = (-h - ol) / dl
            t1 = (h - ol) / dl
            tmin = np.minimum(t0, t1).max(-1)
            tmax = np.maximum(t0, t1).min(-1)
            hit = (tmax > tmin) & (tmax > 0)
            te = np.where(tmin > 0, tmin, tmax)
            pl = ol + te[:, None] * dl
            ax = np.argmax(np.abs(pl) / h, -1)
            n_l = np.zeros((N, 3), np.float32)
            n_l[np.arange(N), ax] = np.sign(pl[np.arange(N), ax])
            consider(te, hit, n_l @ R.T, col, g, k % 2)

        for base, axis, ln, r, col in self.rods:
            oc = rays_o - base
            dpa = d - (d @ axis)[:, None] * axis
            opa = oc - (oc @ axis)[:, None] * axis
            a = np.sum(dpa * dpa, -1)
            b = np.sum(dpa * opa, -1)
            cq = np.sum(opa * opa, -1) - r * r
            disc = b * b - a * cq
            hit = (disc > 0) & (a > 1e-12)
            t = (-b - np.sqrt(np.maximum(disc, 0))) / np.maximum(a, 1e-12)
            s = (rays_o + t[:, None] * d - base) @ axis
            hit &= (s > 0) & (s < ln)
            p = rays_o + t[:, None] * d
            n = p - base - s[:, None] * axis
            n /= np.maximum(np.linalg.norm(n, axis=-1, keepdims=True), 1e-9)
            consider(t, hit, n, col, 0.3, 2)

        c, r, col = self.sph
        oc = rays_o - c
        b = np.sum(oc * d, -1)
        cc = np.sum(oc * oc, -1) - r * r
        disc = b * b - cc
        hit = disc > 0
        t = -b - np.sqrt(np.maximum(disc, 0))
        p = rays_o + t[:, None] * d
        n = (p - c) / r
        consider(t, hit, n, col, 1.0, 2)

        alpha = np.isfinite(best_t).astype(np.float32)
        rgb = np.zeros((N, 3), np.float32)
        m = alpha > 0
        if m.any():
            p = rays_o[m] + best_t[m, None] * d[m]
            a = np.zeros((m.sum(), 3), np.float32)
            for kind in (0, 1, 2):
                km = tex[m] == kind
                if km.any():
                    a[km] = self._albedo(p[km], 1.0, kind) * alb[m][km] \
                        if kind < 2 else alb[m][km]
            L = self.light_dir / np.linalg.norm(self.light_dir)
            nn = nrm[m]
            lam = np.clip(nn @ L, 0, 1)
            # Blinn-Phong specular: genuinely view-dependent
            hvec = L[None] - d[m]
            hvec /= np.maximum(np.linalg.norm(hvec, axis=-1, keepdims=True),
                               1e-9)
            spec = gloss[m] * np.clip(np.sum(nn * hvec, -1), 0, 1) ** 32
            rgb[m] = np.clip(a * (0.25 + 0.75 * lam)[:, None]
                             + spec[:, None], 0, 1)
        return rgb, alpha

    def sdf(self, pts: np.ndarray) -> np.ndarray:
        dmin = np.full(pts.shape[0], np.inf, np.float32)
        for c, h, yaw, _, _ in self.boxes:
            q = np.abs((pts - c) @ self._rot(yaw)) - h
            outside = np.linalg.norm(np.maximum(q, 0), axis=-1)
            inside = np.minimum(q.max(-1), 0)
            dmin = np.minimum(dmin, outside + inside)
        for base, axis, ln, r, _ in self.rods:
            oc = pts - base
            s = np.clip(oc @ axis, 0, ln)
            dmin = np.minimum(
                dmin, np.linalg.norm(oc - s[:, None] * axis, axis=-1) - r)
        c, r, _ = self.sph
        dmin = np.minimum(dmin, np.linalg.norm(pts - c, axis=-1) - r)
        return dmin


def _camera_rays(pose: np.ndarray, H: int, W: int, fl: float,
                 dx: float = 0.5, dy: float = 0.5):
    """Pixel rays with subpixel offset (dx, dy) in [0,1) from the pixel's
    top-left corner (0.5, 0.5 = pixel center)."""
    j, i = np.meshgrid(np.arange(H), np.arange(W), indexing="ij")
    x = (i.reshape(-1) + dx - W / 2) / fl
    y = -(j.reshape(-1) + dy - H / 2) / fl
    dirs = np.stack([x, y, -np.ones_like(x)], -1).astype(np.float32)
    rays_d = dirs @ pose[:3, :3].T
    rays_o = np.broadcast_to(pose[:3, 3], rays_d.shape)
    return rays_o, rays_d


def generate_colmap_dataset(
    root: str,
    scene: SphereScene | None = None,
    H: int = 96,
    W: int = 96,
    n_images: int = 20,
    radius: float = 2.8,
    n_points: int = 2000,
    seed: int = 0,
) -> str:
    """Write a synthetic COLMAP-format dataset (sparse/0/{cameras,images,
    points3D}.bin + images/) rendered from the analytic scene.  Exercises the
    colmap binary writers/readers and the colmap provider end-to-end."""
    from PIL import Image as PILImage

    from .colmap_utils import (Camera, Image, Point3D, rotmat2qvec,
                               write_cameras_binary, write_images_binary,
                               write_points3d_binary)

    # colmap-style captures have real background geometry on every ray
    scene = scene or SphereScene(env_radius=radius * 2.0)
    rng = np.random.default_rng(seed)
    os.makedirs(os.path.join(root, "sparse", "0"), exist_ok=True)
    os.makedirs(os.path.join(root, "images"), exist_ok=True)

    fl = W / (2 * np.tan(np.deg2rad(45) / 2))
    cams = {1: Camera(1, "PINHOLE", W, H,
                      np.array([fl, fl, W / 2, H / 2], np.float64))}

    # sample sparse surface points on the spheres AND the background (real
    # colmap reconstructions include far/background points; pts_aabb derives
    # from these, gating the marching range)
    pts = []
    n_obj = (2 * n_points // 3) // len(scene.radii)
    for c, r in zip(scene.centers, scene.radii):
        d = rng.normal(size=(n_obj, 3))
        d /= np.linalg.norm(d, axis=-1, keepdims=True)
        pts.append(c + r * d)
    if scene.env_radius > 0:
        d = rng.normal(size=(n_points - n_obj * len(scene.radii), 3))
        d /= np.linalg.norm(d, axis=-1, keepdims=True)
        pts.append(d * scene.env_radius)
    pts3d = np.concatenate(pts)

    images = {}
    points = {}
    tracks = {i: [] for i in range(len(pts3d))}
    for k in range(n_images):
        theta = np.arccos(rng.uniform(0.05, 0.95))
        phi = rng.uniform(0, 2 * np.pi)
        center = np.array([radius * np.sin(theta) * np.sin(phi),
                           radius * np.cos(theta),
                           radius * np.sin(theta) * np.cos(phi)])
        # CV convention: +z forward (towards origin), x right, y down
        fwd = -center / np.linalg.norm(center)
        upw = np.array([0.0, 1, 0])
        right = np.cross(fwd, upw)
        right /= np.linalg.norm(right) + 1e-9
        ydown = np.cross(fwd, right)                   # y = z cross x
        R_c2w = np.stack([right, ydown, fwd], axis=-1)
        # world2cam
        Rw2c = R_c2w.T
        t = -Rw2c @ center

        # render image with CV rays: dir_cam = [(i-cx)/f, (j-cy)/f, 1]
        jj, ii = np.meshgrid(np.arange(H) + 0.5, np.arange(W) + 0.5,
                             indexing="ij")
        dirs_cam = np.stack([(ii - W / 2) / fl, (jj - H / 2) / fl,
                             np.ones_like(ii)], -1).reshape(-1, 3)
        dirs_w = dirs_cam @ R_c2w.T
        rays_o = np.broadcast_to(center, dirs_w.shape)
        rgb, alpha = scene.trace(rays_o.astype(np.float32),
                                 dirs_w.astype(np.float32))
        img = (np.clip(rgb.reshape(H, W, 3), 0, 1) * 255).astype(np.uint8)
        name = f"frame_{k:04d}.png"
        PILImage.fromarray(img).save(os.path.join(root, "images", name))

        # project sparse points for xys/tracks
        pc = (pts3d @ Rw2c.T) + t
        vis = pc[:, 2] > 0.1
        uv = np.stack([pc[:, 0] / pc[:, 2] * fl + W / 2,
                       pc[:, 1] / pc[:, 2] * fl + H / 2], -1)
        vis &= (uv[:, 0] >= 0) & (uv[:, 0] < W) & (uv[:, 1] >= 0) & (uv[:, 1] < H)
        vis_ids = np.nonzero(vis)[0]
        xys = uv[vis_ids]
        p3d_ids = vis_ids + 1   # colmap ids are 1-based
        for j, pid in enumerate(vis_ids):
            tracks[pid].append((k + 1, j))
        images[k + 1] = Image(
            k + 1, rotmat2qvec(Rw2c), t, 1, name,
            xys, p3d_ids.astype(np.int64))

    for i, p in enumerate(pts3d):
        tr = tracks[i] or [(1, 0)]
        points[i + 1] = Point3D(
            i + 1, p, np.array([128, 128, 128]), 0.5,
            np.array([a for a, _ in tr]), np.array([b for _, b in tr]))

    sp = os.path.join(root, "sparse", "0")
    write_cameras_binary(cams, os.path.join(sp, "cameras.bin"))
    write_images_binary(images, os.path.join(sp, "images.bin"))
    write_points3d_binary(points, os.path.join(sp, "points3D.bin"))
    return root


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
    ssaa: int = 1,
) -> str:
    """Write a nerf-synthetic-format dataset under `root`. Returns root.

    ssaa: supersampling factor for the ground-truth render — ssaa^2 subpixel
    rays per pixel, alpha-premultiplied average.  Blender's nerf-synthetic GT
    images are antialiased path-traced renders; ssaa=1 (one hard binary
    sample per pixel) puts a band of unmatched binary rim pixels around every
    silhouette that no mesh/volume render can reproduce, which distorts rim
    PSNR relative to the reference's benchmark semantics.  Use ssaa>=3 for
    reference-like GT.
    """
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
            elif split == "val":
                theta = np.pi / 3
                phi = 2 * np.pi * k / n
            else:
                # test poses must NOT coincide with val (ADVICE r4: identical
                # deterministic orbits made the two evals bit-identical on
                # rotationally symmetric scenes) — different elevation and a
                # half-step azimuth offset keep test an independent held-out
                theta = np.pi / 2.4
                phi = 2 * np.pi * (k + 0.5) / n
            pose = orbit_pose(theta, phi, radius)
            s = max(int(ssaa), 1)
            acc_pm = np.zeros((H * W, 3), np.float32)   # premultiplied rgb
            acc_a = np.zeros((H * W,), np.float32)
            for ay in range(s):
                for ax in range(s):
                    rays_o, rays_d = _camera_rays(
                        pose, H, W, fl,
                        dx=(ax + 0.5) / s, dy=(ay + 0.5) / s)
                    rgb_s, a_s = scene.trace(rays_o, rays_d)
                    acc_pm += rgb_s * a_s[:, None]
                    acc_a += a_s
            alpha = acc_a / (s * s)
            rgb = acc_pm / (s * s) / np.maximum(alpha[:, None], 1e-8)
            rgb = np.where(alpha[:, None] > 0, rgb, 0.0)
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
