"""Round-5 ramp-concentration probe: the shell composite only gained
+0.3-0.6 dB, so the volumetric color mass must NOT be concentrated near
the mesh surface.  Measure, along real eval rays of the stage-0 field:

  - the transmittance-weight distribution w(t) (dense 512-sample march),
  - the fraction of w-mass within +-{0.02, 0.04, 0.08, 0.15, 0.30} ngp
    units of (a) the mesh surface depth and (b) the ray's own E[t],
  - the color composite restricted to those windows vs the full ray.

If mass@0.04 is small, the stage-0 field is FOGGY: any surface shading
(single sample OR thin shell — and the reference's own stage 1) needs
density concentrated at a surface; the fix then belongs in stage 0
(sharpening) or the shell must widen to cover the fog.

Usage: CAP_WS=... python workspace/ab/r5_ramp_probe.py
"""
import os
import pickle
import sys

sys.path.insert(0, "/root/repo")

import numpy as np

ROOT = "/root/repo/workspace/runs/scene96aa"
WS = os.environ.get("CAP_WS", "/root/repo/workspace/runs/ws96v9")


def main():
    import jax
    import jax.numpy as jnp

    from nerf2mesh_tpu.config import parse_args
    from nerf2mesh_tpu.data.provider import load_nerf_dataset
    from nerf2mesh_tpu.data.rays import pixel_dirs_cam  # noqa
    from nerf2mesh_tpu.models.network import NetworkSpec, density, rgb
    from nerf2mesh_tpu.utils.trainer import Trainer

    cfg = parse_args([
        ROOT, "--workspace", WS, "--bound", "1", "--scale", "0.8",
        "--dt_gamma", "0", "--iters", "1500", "--test_no_video"])
    t0 = Trainer(cfg)
    assert t0.load_checkpoint(stage=0)
    params = t0.state.params
    nspec = t0.net_spec

    ds = load_nerf_dataset(cfg, "val")
    H, W = ds.H, ds.W
    # subsample rays on a 64x64 grid over the frame
    step = H // 64
    jj, ii = np.meshgrid(np.arange(0, H, step), np.arange(0, W, step),
                         indexing="ij")
    fx, fy, cx, cy = np.asarray(ds.intrinsics_for(0))
    pose = ds.poses[0]
    dcam = np.stack([(ii + 0.5 - cx) / fx, -(jj + 0.5 - cy) / fy,
                     -np.ones_like(ii, np.float32)], -1)
    dirs = dcam.reshape(-1, 3) @ pose[:3, :3].T
    dn = dirs / np.linalg.norm(dirs, axis=-1, keepdims=True)
    o = np.broadcast_to(pose[:3, 3], dn.shape).astype(np.float32)

    # GT alpha for foreground selection
    gt = ds.images[0].astype(np.float32) / 255.0
    ga = gt[::step, ::step, 3].reshape(-1)
    fg = ga > 0.98

    N = dn.shape[0]
    S = 512
    tmin, tmax = 1.2, 4.0
    ts = np.linspace(tmin, tmax, S).astype(np.float32)
    dt = float(ts[1] - ts[0])

    CH = 256   # rays per dispatch: 256*512 pts keeps the encode
    # intermediate [3, N, L, 8] under HBM

    @jax.jit
    def march(o, d):
        pts = o[:, None, :] + ts[None, :, None] * d[:, None, :]   # [CH,S,3]
        x = pts.reshape(-1, 3)
        sig = density(params, x, nspec).reshape(CH, S)
        inb = jnp.all(jnp.abs(pts) <= 1.0, axis=-1)
        sig = jnp.where(inb, sig, 0.0)
        a = 1.0 - jnp.exp(-jnp.maximum(sig, 0.0) * dt)
        T = jnp.cumprod(1.0 - a + 1e-7, axis=-1)
        T = jnp.concatenate([jnp.ones_like(T[:, :1]), T[:, :-1]], axis=-1)
        w = T * a
        return w

    w = np.concatenate([
        np.asarray(march(jnp.asarray(o[c:c + CH]), jnp.asarray(dn[c:c + CH])))
        for c in range(0, N, CH)])
    wsum = w.sum(-1)
    hit = (wsum > 0.5) & fg
    print(f"rays: {N}, fg: {int(fg.sum())}, hit(fg & wsum>.5): "
          f"{int(hit.sum())}", flush=True)
    wh = w[hit]
    whn = wh / wh.sum(-1, keepdims=True)
    Et = (whn * ts[None]).sum(-1)

    # spread around E[t]
    for win in (0.01, 0.02, 0.04, 0.08, 0.15, 0.30):
        m = (np.abs(ts[None, :] - Et[:, None]) <= win)
        frac = (whn * m).sum(-1)
        print(f"w-mass within +-{win:.2f} of E[t]: mean {frac.mean():.3f} "
              f"p10 {np.percentile(frac,10):.3f} "
              f"p50 {np.percentile(frac,50):.3f}", flush=True)

    # mesh surface depth comparison: rasterize? use the stage-1 depth from
    # the mesh via render path would need stage-1 setup; instead compare to
    # the analytic scene surface (known GT for the sphere proxy)
    from nerf2mesh_tpu.data.synthetic import SphereScene
    sc = SphereScene()
    # trace in WORLD coords (ngp = world*scale -> world = ts in pose units)
    rgb_gt, alpha_gt = sc.trace(
        (o / cfg.scale).astype(np.float32), dn.astype(np.float32))
    # analytic depth: re-trace manually for t
    best_t = np.full(N, np.inf, np.float32)
    for c, r, col in zip(sc.centers, sc.radii, sc.colors):
        oc = o / cfg.scale - c
        b = np.sum(oc * dn, -1)
        cc = np.sum(oc * oc, -1) - r * r
        disc = b * b - cc
        t = -b - np.sqrt(np.maximum(disc, 0))
        ok = (disc > 0) & (t > 0) & (t < best_t)
        best_t[ok] = t[ok]
    t_true = best_t * cfg.scale   # back to ngp ray units
    okm = hit & np.isfinite(t_true)
    Et_all = np.zeros(N); Et_all[hit] = Et
    sel = okm
    print(f"E[t] - t_true (ngp): mean {(Et_all[sel]-t_true[sel]).mean():.4f} "
          f"| abs p50 {np.percentile(np.abs(Et_all[sel]-t_true[sel]),50):.4f} "
          f"p90 {np.percentile(np.abs(Et_all[sel]-t_true[sel]),90):.4f}",
          flush=True)
    wa = w[sel] / np.maximum(w[sel].sum(-1, keepdims=True), 1e-9)
    for win in (0.02, 0.04, 0.08, 0.15, 0.30):
        m = (np.abs(ts[None, :] - t_true[sel][:, None]) <= win)
        frac = (wa * m).sum(-1)
        print(f"w-mass within +-{win:.2f} of TRUE surface: "
              f"mean {frac.mean():.3f} p50 {np.percentile(frac,50):.3f}",
              flush=True)

    # ---- color composites on the same rays: full-ray vs window vs point --
    # GT color over white for these rays
    gt_rgb = gt[::step, ::step, :3].reshape(-1, 3)
    gt_a = ga[:, None]
    gt_w = gt_rgb * gt_a + (1 - gt_a)

    @jax.jit
    def colors_chunk(o, d):
        pts = o[:, None, :] + ts[None, :, None] * d[:, None, :]
        x = pts.reshape(-1, 3)
        dr = jnp.broadcast_to(d[:, None, :], pts.shape).reshape(-1, 3)
        c, _ = rgb(params, x, dr, nspec, None, "full")
        return c.reshape(CH, S, 3)

    def psnr(pred, gtc, m):
        e = ((pred - gtc) ** 2)[m]
        return -10 * np.log10(max(float(e.mean()), 1e-12))

    cols = np.concatenate([
        np.asarray(colors_chunk(jnp.asarray(o[c0:c0 + CH]),
                                jnp.asarray(dn[c0:c0 + CH])))
        for c0 in range(0, N, CH)])                       # [N, S, 3]

    wf = w  # [N, S]
    full_c = (wf[..., None] * cols).sum(1) + (1 - wf.sum(1))[:, None]
    print(f"PSNR full-ray composite (fg hit): "
          f"{psnr(full_c, gt_w, hit):.2f}", flush=True)

    Et_all2 = np.where(hit, Et_all, ts[S // 2])
    for win in (0.02, 0.04, 0.08):
        m = (np.abs(ts[None, :] - Et_all2[:, None]) <= win)
        ww = wf * m
        wsum2 = ww.sum(1)
        mean_c = (ww[..., None] * cols).sum(1) / np.maximum(
            wsum2, 1e-6)[:, None]
        # composite with the FULL alpha (GT-style white over full coverage)
        shell_c = mean_c * wf.sum(1)[:, None] + (1 - wf.sum(1))[:, None]
        print(f"PSNR window +-{win:.2f} renormalized composite: "
              f"{psnr(shell_c, gt_w, hit):.2f} "
              f"(window mass mean {(ww.sum(1)[hit]/np.maximum(wf.sum(1)[hit],1e-6)).mean():.3f})",
              flush=True)

    # single sample at E[t]
    kidx = np.clip(((Et_all2 - tmin) / dt).astype(int), 0, S - 1)
    pt_c = cols[np.arange(N), kidx]
    pt_full = pt_c * wf.sum(1)[:, None] + (1 - wf.sum(1))[:, None]
    print(f"PSNR single sample at E[t]: {psnr(pt_full, gt_w, hit):.2f}",
          flush=True)


if __name__ == "__main__":
    main()
