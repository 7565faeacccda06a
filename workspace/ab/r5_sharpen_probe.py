"""Round-5 sharpen probe: the ramp probe showed the stage-0 field renders
41 dB volumetrically but its weight ramp is soft (mass@+-0.01 of E[t] only
0.51 mean) — too wide for ANY surface-point shading (single sample 24.3,
+-0.04 shell 29.3, +-0.08 34.8 vs full-ray 35.6 on probe rays).  The
reference's mesh pipeline implicitly assumes a SHARP field.  Sharpen by
finetuning stage-0 with the per-sample/per-ray weight entropy loss
(trainer.py:507, reference utils.py:728-733) and measure, per entropy
weight:

  - ramp concentration (mass@+-0.01/0.02/0.04 of E[t]),
  - single-sample and +-0.02/0.04-window composite PSNR on probe rays,
  - full val eval (does volumetric quality hold?).

Usage: python workspace/ab/r5_sharpen_probe.py [lam1,lam2,...] [steps]
Writes ws96v11_sharp/ with the finetuned ckpt (for the follow-on chain).
"""
import os
import shutil
import sys

sys.path.insert(0, "/root/repo")

import numpy as np

ROOT = "/root/repo/workspace/runs/scene96aa"
SRC_WS = "/root/repo/workspace/runs/ws96v9"
WS = "/root/repo/workspace/runs/ws96v11_sharp"
LAMS = [float(x) for x in (sys.argv[1] if len(sys.argv) > 1
                           else "1e-3,1e-2").split(",")]
STEPS = int(sys.argv[2]) if len(sys.argv) > 2 else 600


def ramp_stats(trainer, cfg, tag):
    import jax
    import jax.numpy as jnp

    from nerf2mesh_tpu.data.provider import load_nerf_dataset
    from nerf2mesh_tpu.models.network import density, rgb

    params = trainer.state.ema_params or trainer.state.params
    nspec = trainer.net_spec
    ds = load_nerf_dataset(cfg, "val")
    H, W = ds.H, ds.W
    step = H // 64
    jj, ii = np.meshgrid(np.arange(0, H, step), np.arange(0, W, step),
                         indexing="ij")
    fx, fy, cx, cy = np.asarray(ds.intrinsics_for(0))
    pose = ds.poses[0]
    dcam = np.stack([(ii + 0.5 - cx) / fx, -(jj + 0.5 - cy) / fy,
                     -np.ones_like(ii, np.float32)], -1)
    dirs = dcam.reshape(-1, 3) @ pose[:3, :3].T
    dn = (dirs / np.linalg.norm(dirs, axis=-1, keepdims=True)).astype(
        np.float32)
    o = np.broadcast_to(pose[:3, 3], dn.shape).astype(np.float32)
    gt = ds.images[0].astype(np.float32) / 255.0
    ga = gt[::step, ::step, 3].reshape(-1)
    gt_rgb = gt[::step, ::step, :3].reshape(-1, 3)
    gt_w = gt_rgb * ga[:, None] + (1 - ga[:, None])
    fg = ga > 0.98

    N = dn.shape[0]
    S = 512
    tmin, tmax = 1.2, 4.0
    ts = np.linspace(tmin, tmax, S).astype(np.float32)
    dt = float(ts[1] - ts[0])
    CH = 256

    @jax.jit
    def march(o, d):
        pts = o[:, None, :] + ts[None, :, None] * d[:, None, :]
        x = pts.reshape(-1, 3)
        sig = density(params, x, nspec).reshape(CH, S)
        inb = jnp.all(jnp.abs(pts) <= 1.0, axis=-1)
        sig = jnp.where(inb, sig, 0.0)
        a = 1.0 - jnp.exp(-jnp.maximum(sig, 0.0) * dt)
        T = jnp.cumprod(1.0 - a + 1e-7, axis=-1)
        T = jnp.concatenate([jnp.ones_like(T[:, :1]), T[:, :-1]], axis=-1)
        dr = jnp.broadcast_to(d[:, None, :], pts.shape).reshape(-1, 3)
        c, _ = rgb(params, x, dr, nspec, None, "full")
        return T * a, c.reshape(CH, S, 3)

    w_l, c_l = [], []
    for c0 in range(0, N, CH):
        wi, ci = march(jnp.asarray(o[c0:c0+CH]), jnp.asarray(dn[c0:c0+CH]))
        w_l.append(np.asarray(wi)); c_l.append(np.asarray(ci))
    w = np.concatenate(w_l); cols = np.concatenate(c_l)

    wsum = w.sum(-1)
    hit = (wsum > 0.5) & fg
    whn = w[hit] / w[hit].sum(-1, keepdims=True)
    Et = (whn * ts[None]).sum(-1)
    Et_all = np.full(N, ts[S // 2]); Et_all[hit] = Et

    def psnr(pred, m):
        e = ((pred - gt_w) ** 2)[m]
        return -10 * np.log10(max(float(e.mean()), 1e-12))

    full_c = (w[..., None] * cols).sum(1) + (1 - wsum)[:, None]
    line = [f"[{tag}] full-ray {psnr(full_c, hit):.2f}"]
    for win in (0.01, 0.02, 0.04):
        m = (np.abs(ts[None, :] - Et_all[:, None]) <= win)
        frac = (whn * (m[hit])).sum(-1)
        ww = w * m
        mean_c = (ww[..., None] * cols).sum(1) / np.maximum(
            ww.sum(1), 1e-6)[:, None]
        shell_c = mean_c * wsum[:, None] + (1 - wsum)[:, None]
        line.append(f"mass@{win:g} {frac.mean():.3f}/"
                    f"{np.median(frac):.3f} shellPSNR {psnr(shell_c, hit):.2f}")
    kidx = np.clip(((Et_all - tmin) / dt).astype(int), 0, S - 1)
    pt_c = cols[np.arange(N), kidx]
    pt_full = pt_c * wsum[:, None] + (1 - wsum)[:, None]
    line.append(f"point {psnr(pt_full, hit):.2f}")
    print(" | ".join(line), flush=True)


def main():
    import dataclasses

    from nerf2mesh_tpu.config import parse_args
    from nerf2mesh_tpu.data.provider import load_nerf_dataset
    from nerf2mesh_tpu.utils.metrics import PSNRMeter
    from nerf2mesh_tpu.utils.trainer import Trainer

    shutil.rmtree(WS, ignore_errors=True)
    os.makedirs(os.path.join(WS, "checkpoints"))
    shutil.copy(os.path.join(SRC_WS, "checkpoints", "ngp_stage0_latest.ckpt"),
                os.path.join(WS, "checkpoints", "ngp_stage0_latest.ckpt"))

    total = 1500
    cfg = None
    tr = None
    for lam in LAMS:
        total += STEPS
        cfg = parse_args([
            ROOT, "--workspace", WS, "--bound", "1", "--scale", "0.8",
            "--dt_gamma", "0", "--iters", str(total),
            "--num_rays", "8192", "--num_points", "262144",
            "--grid_size", "128", "--diffuse_step", "0",
            "--random_image_batch", "--mark_untrained",
            "--adaptive_num_rays",
            "--lambda_entropy", str(lam), "--test_no_video"])
        tr = Trainer(cfg)
        ds = load_nerf_dataset(cfg, "train")
        val = load_nerf_dataset(cfg, "val")
        assert tr.load_checkpoint(stage=0)
        tr.metrics = [PSNRMeter()]
        if tr is not None and int(tr.state.step) >= total:
            print(f"skip lam={lam}: already at {int(tr.state.step)}")
            continue
        print(f"== finetune lam_entropy={lam} -> step {total}", flush=True)
        tr.train(ds, None)
        res = tr.evaluate(val, name=f"sharp_{lam}")
        print(f"[lam={lam}] val {res}", flush=True)
        ramp_stats(tr, cfg, f"lam={lam}")
        tr.save_checkpoint()


if __name__ == "__main__":
    main()
