#!/usr/bin/env python3
"""Build an image pyramid: images/ -> images_{k}/ at 1/k scale
(parity target: reference scripts/downscale.py)."""

import argparse
import glob
import os

from PIL import Image


def main():
    p = argparse.ArgumentParser()
    p.add_argument("path", help="scene dir containing images/")
    p.add_argument("--downscale", type=int, nargs="+", default=[2, 4, 8])
    args = p.parse_args()

    src = os.path.join(args.path, "images")
    files = sorted(sum((glob.glob(os.path.join(src, e))
                        for e in ("*.jpg", "*.png", "*.jpeg", "*.JPG")), []))
    for k in args.downscale:
        dst = os.path.join(args.path, f"images_{k}")
        os.makedirs(dst, exist_ok=True)
        for f in files:
            img = Image.open(f)
            img = img.resize((img.width // k, img.height // k), Image.LANCZOS)
            img.save(os.path.join(dst, os.path.basename(f)))
        print(f"[done] images_{k}: {len(files)} images")


if __name__ == "__main__":
    main()
