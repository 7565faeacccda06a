import sys; sys.path.insert(0, "/root/repo")
"""Stage-1 quality diagnosis on the capstone checkpoint: where does the
error live?  Splits per-pixel squared error into silhouette band (within
2 px of a gt alpha edge) vs interior, and reports PSNR with the soft-alpha
slope tightened at eval (soft_px sweep).
"""
import dataclasses
import os

import numpy as np

import jax


def main():
    from nerf2mesh_tpu.config import Config
    from nerf2mesh_tpu.data.provider import load_nerf_dataset
    from nerf2mesh_tpu.utils.trainer import Trainer

    cfg = dataclasses.replace(
        Config(path="/tmp/bench_scene"), bound=1.0, scale=0.8, dt_gamma=0.0,
        grid_size=128, stage=1, iters=1000, texture_size=1024, ssaa=1,
        workspace="/tmp/ws_full").finalize()
    ds = load_nerf_dataset(cfg, "val")
    tr = Trainer(cfg)
    assert tr.load_checkpoint(
        os.path.join("/tmp/ws_full/checkpoints", "ngp_stage1_best.ckpt"))
    tr.setup_stage1(ds)

    from nerf2mesh_tpu.data.rays import make_mvps, make_projection

    for sp in (None, 0.7, 0.35):
        if sp is not None:
            spec0 = tr._raster_spec()
            orig = Trainer._raster_spec
            Trainer._raster_spec = lambda self, _s=spec0, _p=sp: \
                dataclasses.replace(_s, soft_px=_p)
            tr._s1_eval_fn = None
        errs, sils, ints = [], [], []
        for i in range(len(ds.poses)):
            pose = ds.poses[i]
            intr = ds.intrinsics_for(0)
            H, W = ds.H, ds.W
            mvp = ds.mvps[i]
            out = tr.render_image_stage1(pose, mvp, intr, H, W)
            pred = np.clip(out["image"], 0, 1)
            gt = ds.images[i].astype(np.float32) / 255.0
            alpha = gt[..., 3:] if gt.shape[-1] == 4 else None
            gt_rgb = gt[..., :3] * alpha + (1 - alpha) if alpha is not None \
                else gt[..., :3]
            e2 = ((pred - gt_rgb) ** 2).mean(-1)
            psnr = -10 * np.log10(max(e2.mean(), 1e-12))
            errs.append(psnr)
            if alpha is not None:
                import scipy.ndimage as ndi
                hard = (alpha[..., 0] > 0.5)
                edge = hard ^ ndi.binary_erosion(hard, iterations=2)
                band = ndi.binary_dilation(edge, iterations=2)
                sils.append(e2[band].sum() / e2.size)
                ints.append(e2[~band].sum() / e2.size)
        tag = "train-spec" if sp is None else f"soft_px={sp}"
        print(f"[{tag}] PSNR {np.mean(errs):.2f}  "
              f"sil-band MSE contrib {np.mean(sils):.6f}  "
              f"interior {np.mean(ints):.6f}", flush=True)
        if sp is not None:
            Trainer._raster_spec = orig
            tr._s1_eval_fn = None


if __name__ == "__main__":
    main()
