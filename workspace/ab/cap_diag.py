"""Capstone stage-1 deficit diagnostic (round-3, ws96v2).

Stage-0 eval reads 40.5 dB; stage-1 train-crop PSNR ~33.5; stage-1 val eval
~27.9.  Decompose on chip:
  1. eval-path render of TRAIN views: if ~33.5 the train estimator agrees
     with the eval path and the deficit is view generalization; if ~28 the
     train estimator is lying (estimator mismatch).
  2. split metrics (interior / rim band / background) + GT-alpha
     recomposition per view for both train and val views.
  3. stage-0 render of the same val view for the rim comparison.

Usage: python workspace/ab/cap_diag.py [n_views]
"""
import os
import sys

sys.path.insert(0, "/root/repo")

import numpy as np

ROOT = "/root/repo/workspace/runs/scene96aa"
WS = os.environ.get("CAP_WS", "/root/repo/workspace/runs/ws96v2")
NV = int(sys.argv[1]) if len(sys.argv) > 1 else 2


def split_metrics(pred, gt_rgba, tag, cov=None):
    from scipy import ndimage
    gt = gt_rgba.astype(np.float32) / 255.0
    alpha = gt[..., 3]
    gt_rgb = gt[..., :3] * alpha[..., None] + (1.0 - alpha[..., None])
    err = (np.clip(pred, 0, 1) - gt_rgb) ** 2
    rim = (alpha > 0.02) & (alpha < 0.98)
    rim = ndimage.binary_dilation(rim, iterations=1)
    interior = (alpha >= 0.98) & ~rim
    bg = (alpha <= 0.02) & ~rim

    def psnr(mask):
        if mask.sum() == 0:
            return float("nan")
        return -10 * np.log10(max(float(err[mask].mean()), 1e-12))

    full = -10 * np.log10(max(float(err.mean()), 1e-12))
    print(f"  {tag}: full {full:.2f} | int {psnr(interior):.2f} | "
          f"rim {psnr(rim):.2f} | bg {psnr(bg):.2f} "
          f"(rim {rim.mean()*100:.1f}% px)", flush=True)
    if cov is not None:
        fg = np.where(cov[..., None] > 1e-3,
                      (pred - (1.0 - cov[..., None]))
                      / np.maximum(cov[..., None], 1e-3), 1.0)
        recomp = np.clip(fg, 0, 1) * alpha[..., None] + (1 - alpha[..., None])
        err2 = (recomp - gt_rgb) ** 2
        print(f"    GT-alpha recomp: full "
              f"{-10*np.log10(max(float(err2.mean()),1e-12)):.2f} | "
              f"rim cov-MAE {np.abs(cov-alpha)[rim].mean():.3f} "
              f"(cov {cov[rim].mean():.3f} vs alpha {alpha[rim].mean():.3f})",
              flush=True)
    return full


def main():
    from nerf2mesh_tpu.config import parse_args
    from nerf2mesh_tpu.data.provider import load_nerf_dataset
    from nerf2mesh_tpu.utils.trainer import Trainer

    # CAP_REFINE must match the run under diagnosis: the refine face-budget
    # changes the padded offsets shape, and a mismatch silently REINITS the
    # checkpoint's offsets (diagnosing the wrong geometry)
    refine = ["--refine"] if os.environ.get("CAP_REFINE", "0") == "1" else []
    shell = []
    if os.environ.get("CAP_SHELL"):
        shell = ["--s1_shell", os.environ["CAP_SHELL"],
                 "--s1_shell_h", os.environ.get("CAP_SHELL_H", "0.02")]
    cfg1 = parse_args([
        ROOT, "--workspace", WS, "--stage", "1", "--bound", "1",
        "--scale", "0.8", "--dt_gamma", "0", "--iters", "1500", *refine,
        *shell,
        "--s1_alpha_eval",
        os.environ.get("CAP_ALPHA_EVAL", "area"),    # production default
        "--test_no_video"])
    t1 = Trainer(cfg1)
    ds_tr = load_nerf_dataset(cfg1, "train")
    t1.setup_stage1(ds_tr)
    if os.environ.get("CAP_SNAP", "0") == "1":
        # reconstruct the run's surface snap (runs that predate the
        # mesh_0_updated.ply persistence fix trained offsets against
        # SNAPPED vertices; the raw mesh_0.ply is the wrong base geometry).
        # The snap is deterministic given the stage-0 params + band recipe
        # (trainer.py train_stage1).
        import pickle

        import jax.numpy as jnp

        from nerf2mesh_tpu.models.stage1 import (pad_stage1_buffers,
                                                 snap_to_apparent_surface)
        with open(os.path.join(WS, "checkpoints",
                               "ngp_stage0_latest.ckpt"), "rb") as f:
            p0 = pickle.load(f)["state"].params
        mesh = t1.stage1_mesh
        v1 = int(mesh.v_cumsum[1])
        band = max(12.0 * 2.0 * cfg1.real_bound / max(cfg1.mcubes_reso, 1),
                   0.09)
        mesh.vertices[:v1] = snap_to_apparent_surface(
            p0, mesh.vertices[:v1],
            mesh.triangles[:int(mesh.f_cumsum[1])], t1.net_spec,
            band=band, n_samples=64, passes=3)
        t1._s1_want_snap = False
        min_f = (getattr(t1, "_s1_face_budget", 0) if cfg1.refine else 0)
        t1.mesh_v = jnp.asarray(
            pad_stage1_buffers(mesh, min_f=min_f)["vertices"])
        print("[cap_diag] snap reconstructed from stage-0 params", flush=True)
    assert t1.load_checkpoint(), "no stage-1 checkpoint"
    ds_val = load_nerf_dataset(cfg1, "val")

    print("== stage-1 eval path on TRAIN views", flush=True)
    for i in range(NV):
        out = t1.render_image_stage1(
            ds_tr.poses[i], ds_tr.mvps[i], ds_tr.intrinsics_for(i),
            ds_tr.H, ds_tr.W)
        split_metrics(out["image"], ds_tr.images[i], f"s1 train{i}",
                      cov=out["weights_sum"])

    print("== stage-1 eval path on VAL views", flush=True)
    for i in range(min(NV, len(ds_val.poses))):
        out = t1.render_image_stage1(
            ds_val.poses[i], ds_val.mvps[i], ds_val.intrinsics_for(i),
            ds_val.H, ds_val.W)
        split_metrics(out["image"], ds_val.images[i], f"s1 val{i}",
                      cov=out["weights_sum"])

    print("== stage-0 on the same views", flush=True)
    cfg0 = parse_args([
        ROOT, "--workspace", WS, "--bound", "1", "--scale", "0.8",
        "--dt_gamma", "0", "--iters", "1500", "--test_no_video"])
    t0 = Trainer(cfg0)
    assert t0.load_checkpoint(stage=0)
    for i in range(min(NV, len(ds_val.poses))):
        out = t0.render_image(ds_val.poses[i], ds_val.intrinsics_for(i),
                              ds_val.H, ds_val.W)
        split_metrics(out["image"], ds_val.images[i], f"s0 val{i}",
                      cov=out["weights_sum"])
    for i in range(1):
        out = t0.render_image(ds_tr.poses[i], ds_tr.intrinsics_for(i),
                              ds_tr.H, ds_tr.W)
        split_metrics(out["image"], ds_tr.images[i], f"s0 train{i}",
                      cov=out["weights_sum"])


if __name__ == "__main__":
    main()
