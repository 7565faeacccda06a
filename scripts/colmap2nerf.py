#!/usr/bin/env python3
"""Convert a COLMAP reconstruction (or a video/image folder) to
transforms.json (parity target: reference scripts/colmap2nerf.py).

Steps (each optional):
  --video <mp4>   : extract frames with ffmpeg at --video_fps
  --run_colmap    : run colmap feature_extractor/matcher/mapper on images/
  always          : read the sparse model (binary via our readers, or text)
                    and write transforms.json with sharpness scores, scene
                    centering and up-vector alignment.

Requires the `colmap` / `ffmpeg` binaries on PATH for those steps.
"""

import argparse
import json
import math
import os
import shutil
import subprocess
import sys

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def sharpness(path) -> float:
    try:
        import cv2
        img = cv2.imread(path)
        return float(cv2.Laplacian(cv2.cvtColor(img, cv2.COLOR_BGR2GRAY),
                                   cv2.CV_64F).var())
    except Exception:
        return 100.0


def run(cmd):
    print("[run]", " ".join(cmd))
    subprocess.run(cmd, check=True)


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--path", required=True, help="scene dir (contains images/)")
    p.add_argument("--video", default="", help="input video to extract frames")
    p.add_argument("--video_fps", type=int, default=3)
    p.add_argument("--run_colmap", action="store_true")
    p.add_argument("--matcher", default="sequential",
                   choices=["sequential", "exhaustive"])
    p.add_argument("--aabb_scale", type=int, default=4)
    args = p.parse_args()

    images = os.path.join(args.path, "images")
    if args.video:
        os.makedirs(images, exist_ok=True)
        run(["ffmpeg", "-i", args.video, "-vf", f"fps={args.video_fps}",
             os.path.join(images, "%04d.jpg")])

    sparse = None
    for cand in ("colmap_sparse/0", "sparse/0", "colmap"):
        c = os.path.join(args.path, cand)
        if os.path.exists(c):
            sparse = c
            break

    if args.run_colmap or sparse is None:
        if shutil.which("colmap") is None:
            sys.exit("[ERROR] colmap binary not found on PATH")
        db = os.path.join(args.path, "colmap.db")
        sparse = os.path.join(args.path, "sparse")
        os.makedirs(sparse, exist_ok=True)
        run(["colmap", "feature_extractor", "--database_path", db,
             "--image_path", images,
             "--ImageReader.camera_model", "SIMPLE_PINHOLE",
             "--ImageReader.single_camera", "1"])
        run(["colmap", f"{args.matcher}_matcher", "--database_path", db])
        run(["colmap", "mapper", "--database_path", db,
             "--image_path", images, "--output_path", sparse])
        run(["colmap", "bundle_adjuster", "--input_path",
             os.path.join(sparse, "0"), "--output_path",
             os.path.join(sparse, "0"),
             "--BundleAdjustment.refine_principal_point", "1"])
        sparse = os.path.join(sparse, "0")

    from nerf2mesh_tpu.data.colmap_utils import (
        read_cameras_binary, read_images_binary)

    cams = read_cameras_binary(os.path.join(sparse, "cameras.bin"))
    ims = read_images_binary(os.path.join(sparse, "images.bin"))
    cam = cams[sorted(cams.keys())[0]]
    if cam.model in ("SIMPLE_PINHOLE", "SIMPLE_RADIAL"):
        fl_x = fl_y = cam.params[0]
        cx, cy = cam.params[1], cam.params[2]
    else:
        fl_x, fl_y = cam.params[0], cam.params[1]
        cx, cy = cam.params[2], cam.params[3]

    frames = []
    c2ws = []
    for k in sorted(ims.keys()):
        im = ims[k]
        w2c = np.eye(4)
        w2c[:3, :3] = im.qvec2rotmat()
        w2c[:3, 3] = im.tvec
        c2w = np.linalg.inv(w2c)
        # colmap(CV, y-down z-fwd) -> nerf(GL, y-up z-back)
        c2w[0:3, 1:3] *= -1
        c2ws.append(c2w)
        fpath = os.path.join("images", os.path.basename(im.name))
        frames.append({
            "file_path": fpath,
            "sharpness": sharpness(os.path.join(args.path, fpath)),
            "transform_matrix": c2w,
        })

    # center scene + align average up to +z (reference colmap2nerf.py:293-321)
    c2ws = np.stack(c2ws)
    center = c2ws[:, :3, 3].mean(0)
    up = c2ws[:, :3, 1].mean(0)
    up /= np.linalg.norm(up)
    v = np.cross(up, [0, 0, 1])
    c = float(np.dot(up, [0, 0, 1]))
    s = np.linalg.norm(v)
    K = np.array([[0, -v[2], v[1]], [v[2], 0, -v[0]], [-v[1], v[0], 0]])
    R = np.eye(3) + K + K @ K * ((1 - c) / (s ** 2 + 1e-10))
    T = np.eye(4)
    T[:3, :3] = R
    for f in frames:
        m = np.array(f["transform_matrix"])
        m[:3, 3] -= center
        f["transform_matrix"] = (T @ m).tolist()

    out = {
        "camera_angle_x": 2 * math.atan(cam.width / (2 * fl_x)),
        "camera_angle_y": 2 * math.atan(cam.height / (2 * fl_y)),
        "fl_x": fl_x, "fl_y": fl_y, "cx": cx, "cy": cy,
        "w": cam.width, "h": cam.height,
        "aabb_scale": args.aabb_scale,
        "frames": frames,
    }
    with open(os.path.join(args.path, "transforms.json"), "w") as fp:
        json.dump(out, fp, indent=2)
    print(f"[done] wrote {len(frames)} frames to transforms.json")


if __name__ == "__main__":
    main()
