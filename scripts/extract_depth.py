#!/usr/bin/env python3
"""Monocular dense depth extraction: images/ -> depths/*.npy
(parity target: reference depth_tools/extract_depth.py, which runs the
omnidata DPT-hybrid model).

Uses a transformers monocular-depth checkpoint if one is available locally
(e.g. Intel/dpt-hybrid-midas via HF cache); offline without weights it exits
with instructions rather than producing garbage.  The colmap provider
calibrates whatever depth comes out against the sparse points with RANSAC
scale/bias, so any affine-consistent monocular depth model works.
"""

import argparse
import glob
import os
import sys

import numpy as np
from PIL import Image


def main():
    p = argparse.ArgumentParser()
    p.add_argument("path", help="scene dir containing images/")
    p.add_argument("--model", default="Intel/dpt-hybrid-midas")
    args = p.parse_args()

    try:
        import torch
        from transformers import DPTForDepthEstimation, DPTImageProcessor
        proc = DPTImageProcessor.from_pretrained(args.model)
        model = DPTForDepthEstimation.from_pretrained(args.model)
    except Exception as e:
        sys.exit(
            f"[ERROR] no local depth model available ({e}).\n"
            "Download a DPT checkpoint (e.g. Intel/dpt-hybrid-midas) into the\n"
            "huggingface cache, or provide depths/*.npy from another source;\n"
            "the training-time RANSAC calibration accepts any affine depth.")

    src = os.path.join(args.path, "images")
    dst = os.path.join(args.path, "depths")
    os.makedirs(dst, exist_ok=True)
    files = sorted(sum((glob.glob(os.path.join(src, e))
                        for e in ("*.jpg", "*.png", "*.jpeg")), []))
    model.eval()
    for f in files:
        img = Image.open(f).convert("RGB")
        with torch.no_grad():
            inputs = proc(images=img, return_tensors="pt")
            depth = model(**inputs).predicted_depth[0].numpy()
        # DPT predicts inverse-ish depth; invert to metric-like (affine ok)
        depth = 1.0 / np.maximum(depth, 1e-6)
        name = os.path.splitext(os.path.basename(f))[0] + ".npy"
        np.save(os.path.join(dst, name), depth.astype(np.float32))
        print("[done]", name, depth.shape)


if __name__ == "__main__":
    main()
