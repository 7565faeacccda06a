"""Round-5 speckle probe (VERDICT r4 task 3: own the interior deficit).

Round-5 finding from v9's saved final renders: held-out error is 78-92%
INTERIOR (int PSNR 20-25), visible as dense triangle-scale speckle — NOT
the rim/alpha story the round-3/4 estimator work closed.  GT is the
DIFFUSE SphereScene, so a converged surface-color field should generalize
to held-out views trivially; the speckle must come from one of:

  A. the specular head painting view-dependent noise at held-out dirs
     (full color = clip(diffuse + spec(x, d)); spec is pure overfit
     capacity on a diffuse scene)
  B. the diffuse field itself scrambled at fine hash levels during
     stage-1 training (drift from the stage-0 field)
  C. geometry: per-vertex snap/offset error displacing the (detached)
     surface queries into the field's unconstrained interior

Renders one val + one train view on the v9 checkpoint in a 2x2 matrix:
  {v9 stage-1 params, stage-0 params} x {full, diffuse} shading,
all on the SAME v9 geometry (snapped verts + trained offsets), and reports
split metrics.  A->diffuse rows fix it; B->stage-0 rows fix it; C->nothing
fixes it (then the next probe is multi-sample surface queries).

Usage: CAP_WS=... python workspace/ab/r5_speckle_probe.py
"""
import os
import pickle
import sys

sys.path.insert(0, "/root/repo")
sys.path.insert(0, "/root/repo/workspace/ab")

import numpy as np

_argv = sys.argv[1:]
sys.argv = sys.argv[:1]
from cap_diag import split_metrics

ROOT = "/root/repo/workspace/runs/scene96aa"
WS = os.environ.get("CAP_WS", "/root/repo/workspace/runs/ws96v9")
OUT = "/root/repo/workspace/validation/round5"
os.makedirs(OUT, exist_ok=True)


def main():
    import jax
    import jax.numpy as jnp

    from nerf2mesh_tpu.config import parse_args
    from nerf2mesh_tpu.data.provider import load_nerf_dataset
    from nerf2mesh_tpu.data.rays import pixel_dirs_cam  # noqa: F401
    from nerf2mesh_tpu.models.stage1 import render_stage1_crop
    from nerf2mesh_tpu.utils.trainer import Trainer

    cfg = parse_args([
        ROOT, "--workspace", WS, "--stage", "1", "--bound", "1",
        "--scale", "0.8", "--dt_gamma", "0", "--iters", "1500",
        "--test_no_video"])
    t1 = Trainer(cfg)
    ds_tr = load_nerf_dataset(cfg, "train")
    t1.setup_stage1(ds_tr)

    # reconstruct the v9 snap from stage-0 params (pre-persistence-fix run)
    if not os.path.exists(os.path.join(WS, "mesh_stage0",
                                       "mesh_0_updated.ply")):
        from nerf2mesh_tpu.models.stage1 import (pad_stage1_buffers,
                                                 snap_to_apparent_surface)
        with open(os.path.join(WS, "checkpoints",
                               "ngp_stage0_latest.ckpt"), "rb") as f:
            p0_state = pickle.load(f)["state"]
        p0 = p0_state.params
        mesh = t1.stage1_mesh
        v1 = int(mesh.v_cumsum[1])
        band = max(12.0 * 2.0 * cfg.real_bound / max(cfg.mcubes_reso, 1),
                   0.09)
        mesh.vertices[:v1] = snap_to_apparent_surface(
            p0, mesh.vertices[:v1],
            mesh.triangles[:int(mesh.f_cumsum[1])], t1.net_spec,
            band=band, n_samples=64, passes=3)
        t1.mesh_v = jnp.asarray(pad_stage1_buffers(mesh)["vertices"])
        t1._s1_want_snap = False
        print("[probe] snap reconstructed", flush=True)
    else:
        with open(os.path.join(WS, "checkpoints",
                               "ngp_stage0_latest.ckpt"), "rb") as f:
            p0 = pickle.load(f)["state"].params

    assert t1.load_checkpoint(), "no stage-1 ckpt"
    p1 = t1.state.params
    # stage-0 params + the trained offsets (same geometry for every cell)
    p0 = dict(p0)
    p0["vertices_offsets"] = p1["vertices_offsets"]

    ds_val = load_nerf_dataset(cfg, "val")
    rspec = t1._raster_spec()
    nspec = t1.net_spec
    ss = max(int(cfg.ssaa), 1)
    H, W = ds_val.H, ds_val.W
    Cp = rspec.crop
    Cs = Cp * ss

    def render(params, pose, mvp, intr, shading):
        @jax.jit
        def _eval(params, mesh_v, mesh_f, f_real, mvp, origin, dirs, bg):
            return render_stage1_crop(
                params, params["vertices_offsets"], mesh_v, mesh_f,
                mvp, origin, dirs, bg, nspec, rspec, H, W,
                shading=shading, contracted=cfg.contract,
                alpha_mode=cfg.s1_alpha_eval, f_valid=f_real, ssaa=ss)
        image = np.zeros((H, W, 3), np.float32)
        wsum = np.zeros((H, W), np.float32)
        fx, fy, cx, cy = np.asarray(intr)
        bg = jnp.ones((Cs, Cs, 3))
        sub = (np.arange(Cs) + 0.5) / ss
        for y0 in range(0, H, Cp):
            for x0 in range(0, W, Cp):
                jj, ii = np.meshgrid(y0 + sub, x0 + sub, indexing="ij")
                dcam = np.stack([(ii - cx) / fx, -(jj - cy) / fy,
                                 -np.ones_like(ii)], -1)
                dirs = (dcam.reshape(-1, 3) @ np.asarray(pose)[:3, :3].T
                        ).reshape(Cs, Cs, 3).astype(np.float32)
                out = _eval(params, t1.mesh_v, t1.mesh_f, t1.s1_counts[1],
                            jnp.asarray(mvp), jnp.asarray([y0, x0]),
                            jnp.asarray(dirs), bg)
                h = min(Cp, H - y0); w = min(Cp, W - x0)
                image[y0:y0+h, x0:x0+w] = np.asarray(out["image"])[:h, :w]
                wsum[y0:y0+h, x0:x0+w] = (
                    np.asarray(out["weights_sum"])[:h, :w])
        return image, wsum

    from PIL import Image
    for vname, ds, vi in (("val0", ds_val, 0), ("train0", ds_tr, 0)):
        for pname, params in (("s1", p1), ("s0", p0)):
            for shading in ("full", "diffuse"):
                img, wsum = render(params, ds.poses[vi], ds.mvps[vi],
                                   ds.intrinsics_for(vi), shading)
                split_metrics(img, ds.images[vi],
                              f"{vname} {pname} {shading}", cov=wsum)
                Image.fromarray(
                    (np.clip(img, 0, 1) * 255).astype(np.uint8)).save(
                    os.path.join(OUT, f"speckle_{vname}_{pname}_{shading}.png"))


if __name__ == "__main__":
    main()
