"""Isolate the stage-1 rim dilation (cov 0.71 vs GT alpha 0.52, s1_cpu_debug):

  (a) TRUE mesh coverage: rasterize at ssaa=3 with hard pixel-center
      coverage and average-pool -> area-averaged silhouette of the mesh
      geometry itself.  Compare vs GT alpha with and without the trained
      offsets.  If this is already fat -> stage-0 export geometry problem.
  (b) EVAL-mode coverage (ssaa=1, alpha_mode aa) -> if (a) is tight but
      (b) is fat, the 1-spp aa eval path over-covers.

Uses the s1dbg workspace produced by s1_cpu_debug.py.
Usage: python workspace/ab/s1_cov_probe.py
"""
import sys

sys.path.insert(0, "/root/repo")

import jax

jax.config.update("jax_platforms", "cpu")

import numpy as np
import jax.numpy as jnp

from nerf2mesh_tpu.config import parse_args

ROOT = "/root/repo/workspace/runs/s1dbg_scene"
WS = "/root/repo/workspace/runs/s1dbg_ws"


def cfg_for(extra):
    return parse_args([
        ROOT, "--workspace", WS, "--bound", "1", "--scale", "0.8",
        "--dt_gamma", "0", "--num_rays", "1024", "--num_points", "32768",
        "--samples_per_ray", "32", "--max_steps", "64", "--grid_size", "16",
        "--diffuse_step", "50", "--random_image_batch",
        "--n_eval", "1", "--n_ckpt", "1", *extra])


def mesh_coverage(t, pose, mvp, intrinsics, H, W, *, use_offsets, ssaa,
                  alpha_mode):
    """Full-frame coverage map by looping crops through render_stage1_crop."""
    from nerf2mesh_tpu.models.stage1 import render_stage1_crop

    rspec = t._raster_spec()
    Cp = rspec.crop
    params = dict(t.state.params)
    if not use_offsets:
        params["vertices_offsets"] = jnp.zeros_like(
            params["vertices_offsets"])
    fx, fy, cx, cy = np.asarray(intrinsics)
    cov = np.zeros((H, W), np.float32)
    s = max(ssaa, 1)
    for y0 in range(0, H, Cp):
        for x0 in range(0, W, Cp):
            Cs = Cp * s
            sub = (np.arange(Cs) + 0.5) / s
            jj = y0 + sub[:, None] + np.zeros((1, Cs))
            ii = x0 + sub[None, :] + np.zeros((Cs, 1))
            dcam = np.stack([(ii - cx) / fx, -(jj - cy) / fy,
                             -np.ones_like(ii)], -1)
            dirs = (dcam.reshape(-1, 3) @ np.asarray(pose)[:3, :3].T
                    ).reshape(Cs, Cs, 3).astype(np.float32)
            out = render_stage1_crop(
                params, params["vertices_offsets"], t.mesh_v, t.mesh_f,
                jnp.asarray(mvp), jnp.asarray([y0, x0]), jnp.asarray(dirs),
                jnp.ones((Cs, Cs, 3)), t.net_spec, rspec, H, W,
                shading="diffuse", contracted=False, ssaa=s,
                alpha_mode=alpha_mode, f_valid=t.s1_counts[1])
            h = min(Cp, H - y0); w = min(Cp, W - x0)
            cov[y0:y0+h, x0:x0+w] = np.asarray(out["weights_sum"])[:h, :w]
    return cov


def report(tag, cov, alpha):
    rim = (alpha > 0.02) & (alpha < 0.98)
    from scipy import ndimage
    rim = ndimage.binary_dilation(rim, iterations=1)
    bgmask = alpha <= 0.02
    print(f"  {tag}: rim MAE {np.abs(cov - alpha)[rim].mean():.3f} "
          f"| mean cov {cov[rim].mean():.3f} vs alpha {alpha[rim].mean():.3f} "
          f"| bg mean cov {cov[bgmask].mean():.4f} "
          f"| full MAE {np.abs(cov - alpha).mean():.4f}", flush=True)


def main():
    from nerf2mesh_tpu.data.provider import load_nerf_dataset
    from nerf2mesh_tpu.utils.trainer import Trainer

    cfg1 = cfg_for(["--iters", "300", "--stage", "1",
                    "--s1_alpha_eval", "aa"])
    t = Trainer(cfg1)
    ds = load_nerf_dataset(cfg1, "train")
    t.setup_stage1(ds)
    assert t.load_checkpoint(), "need the trained s1dbg checkpoint"
    ds_val = load_nerf_dataset(cfg1, "val")

    for i in range(len(ds_val.poses)):
        gt = ds_val.images[i].astype(np.float32) / 255.0
        alpha = gt[..., 3]
        args = (t, ds_val.poses[i], ds_val.mvps[i], ds_val.intrinsics_for(i),
                ds_val.H, ds_val.W)
        print(f"view {i}:", flush=True)
        c = mesh_coverage(*args, use_offsets=False, ssaa=3, alpha_mode="hard")
        report("geom  no-offsets ssaa3-hard", c, alpha)
        c = mesh_coverage(*args, use_offsets=True, ssaa=3, alpha_mode="hard")
        report("geom with-offsets ssaa3-hard", c, alpha)
        c = mesh_coverage(*args, use_offsets=True, ssaa=1, alpha_mode="aa")
        report("eval with-offsets ssaa1-aa  ", c, alpha)
        c = mesh_coverage(*args, use_offsets=True, ssaa=1, alpha_mode="soft")
        report("eval with-offsets ssaa1-soft", c, alpha)


if __name__ == "__main__":
    main()
