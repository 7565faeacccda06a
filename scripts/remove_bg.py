#!/usr/bin/env python3
"""Background removal: images/ -> mask/ (parity target: reference
scripts/remove_bg.py, which uses carvekit).

Tries rembg/carvekit if installed; otherwise falls back to a simple
border-statistics chroma mask (works for studio-style captures with a
roughly uniform background) so the pipeline stays runnable offline.
"""

import argparse
import glob
import os

import numpy as np
from PIL import Image


def simple_mask(img: np.ndarray) -> np.ndarray:
    """Distance-from-border-color threshold; crude offline fallback."""
    f = img.astype(np.float32)
    border = np.concatenate([
        f[0].reshape(-1, 3), f[-1].reshape(-1, 3),
        f[:, 0].reshape(-1, 3), f[:, -1].reshape(-1, 3)])
    bg = np.median(border, axis=0)
    dist = np.linalg.norm(f - bg, axis=-1)
    thr = max(30.0, dist.mean() * 0.5)
    return (dist > thr).astype(np.uint8) * 255


def main():
    p = argparse.ArgumentParser()
    p.add_argument("path", help="scene dir containing images/")
    args = p.parse_args()

    src = os.path.join(args.path, "images")
    dst = os.path.join(args.path, "mask")
    os.makedirs(dst, exist_ok=True)
    files = sorted(sum((glob.glob(os.path.join(src, e))
                        for e in ("*.jpg", "*.png", "*.jpeg")), []))

    seg = None
    try:  # pragma: no cover - optional dependency
        from rembg import remove as seg  # noqa: F401
    except ImportError:
        print("[WARN] rembg/carvekit unavailable; using border-color fallback")

    for f in files:
        img = np.asarray(Image.open(f).convert("RGB"))
        if seg is not None:
            out = np.asarray(seg(Image.fromarray(img)))
            mask = out[..., 3] if out.shape[-1] == 4 else simple_mask(img)
        else:
            mask = simple_mask(img)
        name = os.path.splitext(os.path.basename(f))[0] + ".png"
        Image.fromarray(mask).save(os.path.join(dst, name))
    print(f"[done] wrote {len(files)} masks to {dst}")


if __name__ == "__main__":
    main()
