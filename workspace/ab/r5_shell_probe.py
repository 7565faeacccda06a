"""Round-5 shell calibration probe: the speckle probe proved the mesh
single-sample path broken EVEN WITH the pristine stage-0 field (val0
24.96 dB / int 16.5 vs the volumetric render's 41.4 / 36.3) — per-point
color of a volumetrically-trained field is only meaningful as a ray
ensemble.  The thin-shell composite re-integrates along the view ray; if
it is the right estimator, stage-0 params + shell should render close to
the volumetric number WITHOUT ANY stage-1 training.

Grid: {s0, s1} params x shell (K, h) in {(4,0.02),(4,0.04),(8,0.04),
(8,0.08),(16,0.08)} on one val + one train view.  Output picks
CAP10_SHELL_K/H for the capstone shell arm.

Usage: CAP_WS=... python workspace/ab/r5_shell_probe.py
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
    from nerf2mesh_tpu.models.stage1 import render_stage1_crop
    from nerf2mesh_tpu.utils.trainer import Trainer

    cfg = parse_args([
        ROOT, "--workspace", WS, "--stage", "1", "--bound", "1",
        "--scale", "0.8", "--dt_gamma", "0", "--iters", "1500",
        "--test_no_video"])
    t1 = Trainer(cfg)
    ds_tr = load_nerf_dataset(cfg, "train")
    t1.setup_stage1(ds_tr)

    with open(os.path.join(WS, "checkpoints",
                           "ngp_stage0_latest.ckpt"), "rb") as f:
        p0 = pickle.load(f)["state"].params
    if not os.path.exists(os.path.join(WS, "mesh_stage0",
                                       "mesh_0_updated.ply")):
        from nerf2mesh_tpu.models.stage1 import (pad_stage1_buffers,
                                                 snap_to_apparent_surface)
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

    assert t1.load_checkpoint(), "no stage-1 ckpt"
    p1 = t1.state.params
    p0 = dict(p0)
    p0["vertices_offsets"] = p1["vertices_offsets"]

    ds_val = load_nerf_dataset(cfg, "val")
    rspec = t1._raster_spec()
    nspec = t1.net_spec
    ss = max(int(cfg.ssaa), 1)
    H, W = ds_val.H, ds_val.W
    Cp = rspec.crop
    Cs = Cp * ss

    _cache = {}

    def render(params, pose, mvp, intr, shell_k, shell_h):
        # one compile per K — h rides as a traced scalar
        if shell_k not in _cache:
            @jax.jit
            def _eval(params, mesh_v, mesh_f, f_real, mvp, origin, dirs,
                      bg, hh, _k=shell_k):
                return render_stage1_crop(
                    params, params["vertices_offsets"], mesh_v, mesh_f,
                    mvp, origin, dirs, bg, nspec, rspec, H, W,
                    shading="full", contracted=cfg.contract,
                    alpha_mode=cfg.s1_alpha_eval, f_valid=f_real, ssaa=ss,
                    shell_k=_k, shell_h=hh)
            _cache[shell_k] = _eval
        _ev = _cache[shell_k]

        def _eval(params, mesh_v, mesh_f, f_real, mvp, origin, dirs, bg):
            return _ev(params, mesh_v, mesh_f, f_real, mvp, origin, dirs,
                       bg, jnp.float32(shell_h))
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
                h2 = min(Cp, H - y0); w2 = min(Cp, W - x0)
                image[y0:y0+h2, x0:x0+w2] = np.asarray(out["image"])[:h2, :w2]
                wsum[y0:y0+h2, x0:x0+w2] = (
                    np.asarray(out["weights_sum"])[:h2, :w2])
        return image, wsum

    from PIL import Image
    GRID = [(4, 0.02), (4, 0.04), (8, 0.04), (8, 0.08), (16, 0.08)]
    for vname, ds, vi in (("val0", ds_val, 0), ("train0", ds_tr, 0)):
        for pname, params in (("s0", p0), ("s1", p1)):
            for K, h in GRID:
                img, ws = render(params, ds.poses[vi], ds.mvps[vi],
                                 ds.intrinsics_for(vi), K, h)
                split_metrics(img, ds.images[vi],
                              f"{vname} {pname} shell K={K} h={h}", cov=ws)
                if vname == "val0":
                    Image.fromarray(
                        (np.clip(img, 0, 1) * 255).astype(np.uint8)).save(
                        os.path.join(
                            OUT, f"shellprobe_{vname}_{pname}_K{K}h{h}.png"))


if __name__ == "__main__":
    main()
