"""CPU-reproducible stage-1 deficit (round-3): the 2 dB gate test fails at
toy scale on CPU (f32 — NOT the bf16 chip bug), so the remaining stage-1
problem can be debugged locally.  This driver reruns the scenario at a
slightly larger scale with capstone-like ssaa=3 GT and decomposes the error:

  - full / interior / rim-band / background PSNR for stage-0 AND stage-1
  - stage-1 recomposited with GT alpha (round-2 probe: 35.9 dB there means
    the rim PLACEMENT is the problem, not the texture)
  - coverage-vs-GT-alpha MAE on the rim band

Usage: python workspace/ab/s1_cpu_debug.py [s1_iters]
"""
import sys

sys.path.insert(0, "/root/repo")

import jax

jax.config.update("jax_platforms", "cpu")

import os

import numpy as np

from nerf2mesh_tpu.config import parse_args

ROOT = "/root/repo/workspace/runs/s1dbg_scene"
WS = "/root/repo/workspace/runs/s1dbg_ws"
S1_ITERS = int(sys.argv[1]) if len(sys.argv) > 1 else 300
EXTRA = sys.argv[2:]          # extra cli flags forwarded to the stage-1 cfg


def build_scene():
    from nerf2mesh_tpu.data.synthetic import generate_synthetic_dataset
    if not os.path.exists(os.path.join(ROOT, "transforms_train.json")):
        generate_synthetic_dataset(ROOT, H=48, W=48, n_train=16, n_val=3,
                                   n_test=2, ssaa=3)


def cfg_for(extra):
    return parse_args([
        ROOT, "--workspace", WS, "--bound", "1", "--scale", "0.8",
        "--dt_gamma", "0", "--num_rays", "1024", "--num_points", "32768",
        "--samples_per_ray", "32", "--max_steps", "64", "--grid_size", "16",
        "--diffuse_step", "50", "--random_image_batch",
        "--n_eval", "1", "--n_ckpt", "1", *extra])


def split_metrics(pred, gt_rgba, tag):
    gt = gt_rgba.astype(np.float32) / 255.0
    alpha = gt[..., 3]
    gt_rgb = gt[..., :3] * alpha[..., None] + (1.0 - alpha[..., None])
    err = (np.clip(pred, 0, 1) - gt_rgb) ** 2

    rim = (alpha > 0.02) & (alpha < 0.98)
    # dilate rim by 1 px (the misplacement lives within ~1 px of the edge)
    from scipy import ndimage
    rim = ndimage.binary_dilation(rim, iterations=1)
    interior = (alpha >= 0.98) & ~rim
    bg = (alpha <= 0.02) & ~rim

    def psnr(mask):
        if mask.sum() == 0:
            return float("nan")
        return -10 * np.log10(max(float(err[mask].mean()), 1e-12))

    full = -10 * np.log10(max(float(err.mean()), 1e-12))
    print(f"  {tag}: full {full:.2f} | interior {psnr(interior):.2f} | "
          f"rim {psnr(rim):.2f} | bg {psnr(bg):.2f} "
          f"(rim {rim.mean()*100:.1f}% of px)", flush=True)
    return full


def main():
    build_scene()
    from nerf2mesh_tpu.data.provider import load_nerf_dataset
    from nerf2mesh_tpu.utils.trainer import Trainer

    cfg0 = cfg_for(["--iters", "500"])
    ds = load_nerf_dataset(cfg0, "train")
    ds_val = load_nerf_dataset(cfg0, "val")
    t0 = Trainer(cfg0)
    if not t0.load_checkpoint(stage=0):
        t0.train(ds)
        t0.save_mesh(resolution=64, decimate_target=8000)
    print("== stage-0 per-view splits", flush=True)
    for i in range(len(ds_val.poses)):
        out = t0.render_image(ds_val.poses[i], ds_val.intrinsics_for(i),
                              ds_val.H, ds_val.W)
        split_metrics(out["image"], ds_val.images[i], f"s0 view{i}")

    cfg1 = cfg_for(["--iters", str(S1_ITERS), "--stage", "1",
                    "--s1_alpha_eval", "aa", *EXTRA])
    t1 = Trainer(cfg1)
    ds1 = load_nerf_dataset(cfg1, "train")
    t1.setup_stage1(ds1)
    if not t1.load_checkpoint():
        assert t1.load_checkpoint(stage=0)
    t1.train_stage1(ds1)

    print("== stage-1 per-view splits", flush=True)
    ds_val1 = load_nerf_dataset(cfg1, "val")
    for i in range(len(ds_val1.poses)):
        out = t1.render_image_stage1(
            ds_val1.poses[i], ds_val1.mvps[i], ds_val1.intrinsics_for(i),
            ds_val1.H, ds_val1.W)
        pred = out["image"]
        cov = out["weights_sum"]
        split_metrics(pred, ds_val1.images[i], f"s1 view{i}")

        gt = ds_val1.images[i].astype(np.float32) / 255.0
        alpha = gt[..., 3]
        # recompose the stage-1 FOREGROUND with the GT alpha: isolates rim
        # placement from texture quality (bg here is white)
        fg = np.where(cov[..., None] > 1e-3,
                      (pred - (1.0 - cov[..., None])) / np.maximum(
                          cov[..., None], 1e-3), 1.0)
        recomp = np.clip(fg, 0, 1) * alpha[..., None] + (1 - alpha[..., None])
        split_metrics(recomp, ds_val1.images[i], f"s1 view{i} GT-alpha")
        rim = (alpha > 0.02) & (alpha < 0.98)
        if rim.sum():
            print(f"    cov-vs-alpha: rim MAE {np.abs(cov - alpha)[rim].mean():.3f} "
                  f"| mean cov {cov[rim].mean():.3f} vs alpha {alpha[rim].mean():.3f}",
                  flush=True)


if __name__ == "__main__":
    main()
