"""Locate the +0.06 rim overcoverage that the area-eval reports at ORACLE
geometry on the capstone scene (oracle_area.log arm B: cov 0.56 vs GT 0.50),
which contradicts r4_area_probe (estimator exact on clean meshes).

Renders ONE val view of the capstone mesh with vertices projected exactly
onto the analytic spheres, three ways:
  1. production eval path (render_image_stage1: area, ssaa=cfg)  -> cov
  2. direct rasterize_crop, strict coverage pooled at ssaa=4, HUGE budgets
     -> TRUE mesh union coverage
  3. direct rasterize_crop "area" at 1 spp, HUGE budgets
If (2) is dilated vs GT -> the projected MESH is dilated (projection/seam
artifact).  If (2) is clean but (1) dilated -> the eval path is biased
(budget drops / pooling / f_valid).  CPU.
"""
import os
import sys

sys.path.insert(0, "/root/repo")
sys.path.insert(0, "/root/repo/workspace/ab")

import jax

jax.config.update("jax_platforms", "cpu")

import numpy as np
import jax.numpy as jnp

_argv = sys.argv[1:]
sys.argv = sys.argv[:1]
from oracle_probe import project_to_spheres, set_offsets  # noqa: E402

from nerf2mesh_tpu.config import parse_args
from nerf2mesh_tpu.data.provider import load_nerf_dataset
from nerf2mesh_tpu.utils.trainer import Trainer
from nerf2mesh_tpu.models.rasterizer import (RasterSpec, rasterize_crop,
                                             transform_clip)

ROOT = "/root/repo/workspace/runs/scene96aa"
WS = "/root/repo/workspace/runs/ws96v5"

cfg1 = parse_args([
    ROOT, "--workspace", WS, "--stage", "1", "--bound", "1",
    "--scale", "0.8", "--dt_gamma", "0", "--iters", "1500", "--refine",
    "--test_no_video"])
t1 = Trainer(cfg1)
ds_tr = load_nerf_dataset(cfg1, "train")
t1.setup_stage1(ds_tr)
assert t1.load_checkpoint(), "no checkpoint"
ds_val = load_nerf_dataset(cfg1, "val")

v_real, f_real = t1._s1_real_shape
base = np.asarray(t1.mesh_v)[:v_real]
cur_off = np.asarray(t1.state.params["vertices_offsets"])[:v_real]
v_oracle = project_to_spheres(base + cur_off)
set_offsets(t1, v_oracle)

i = 0
gt = ds_val.images[i].astype(np.float32) / 255.0
alpha_gt = gt[..., 3]
H, W = ds_val.H, ds_val.W
rim = (alpha_gt > 0.02) & (alpha_gt < 0.98)

def stats(tag, cov):
    d = (cov - alpha_gt)[rim]
    print(f"  {tag}: rim mean {d.mean():+.4f} MAE {np.abs(d).mean():.4f} "
          f"(cov {cov[rim].mean():.3f} vs GT {alpha_gt[rim].mean():.3f})",
          flush=True)

# 1. production eval path
out = t1.render_image_stage1(ds_val.poses[i], ds_val.mvps[i],
                             ds_val.intrinsics_for(i), H, W)
stats("eval path (area, ssaa cfg)", np.asarray(out["weights_sum"]))

# 2./3. direct raster with huge budgets
tris = np.asarray(t1.mesh_f)[:f_real]
verts = jnp.asarray(v_oracle)
mvp = jnp.asarray(ds_val.mvps[i])

def direct(res, spec, field):
    vc = transform_clip(verts, mvp)
    tt = jnp.asarray(tris)
    C = spec.crop
    n = res // C
    img = np.zeros((res, res), np.float32)
    ovf = 0
    for iy in range(n):
        for ix in range(n):
            r = rasterize_crop(vc, tt, jnp.asarray([iy * C, ix * C]),
                               res, res, spec)
            img[iy*C:(iy+1)*C, ix*C:(ix+1)*C] = np.asarray(
                r[field]).astype(np.float32)
            ovf += int(np.asarray(r["overflow"]))
    if ovf:
        print(f"  [direct {field}@{res}: overflow {ovf}]", flush=True)
    return img

spec = RasterSpec(crop=128, max_tris=131072, frag=8, max_frags=1 << 22)
s = 4
strict4 = direct(H * s, spec, "strict")
stats("direct strict ssaa4 (true union)",
      strict4.reshape(H, s, W, s).mean((1, 3)))
stats("direct area 1spp", direct(H, spec, "area"))
stats("direct union16 1spp", direct(H, spec, "union"))
print("done", flush=True)
