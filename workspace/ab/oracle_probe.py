"""Round-4 oracle probe: is the stage-1 rim deficit a pipeline ceiling or an
optimization failure?

scene96aa's GT is the analytic SphereScene (3 spheres), so the TRUE surface
is known in closed form.  Three phases on the ws96v2 capstone checkpoint:

  A. baseline  — eval the trained stage-1 geometry (sanity vs cap_diag).
  B. oracle    — project every vertex exactly onto the nearest sphere
                 surface and re-eval.  If this reads >= ~39.5 dB the
                 rasterize/AA/ssaa eval estimator can express the target
                 quality and the deficit is purely training-side; if it
                 reads ~31 dB the estimator itself is the ceiling.
  C. oracle_train — run N standard training steps FROM the oracle geometry
                 (no refines) and re-eval.  Degradation means the training
                 loss's optimum disagrees with the eval estimator (loss-side
                 estimator mismatch); staying put means the signal is fine
                 and the problem is convergence from the MC initialization.

Usage: python workspace/ab/oracle_probe.py [phases=ABC] [train_steps=240]
"""
import os
import sys

sys.path.insert(0, "/root/repo")
sys.path.insert(0, "/root/repo/workspace/ab")

import numpy as np

_argv = sys.argv[1:]
sys.argv = sys.argv[:1]          # cap_diag parses sys.argv at import
from cap_diag import split_metrics

ROOT = "/root/repo/workspace/runs/scene96aa"
WS = "/root/repo/workspace/runs/ws96v2"
PHASES = _argv[0] if len(_argv) > 0 else "ABC"
TRAIN_STEPS = int(_argv[1]) if len(_argv) > 1 else 240

SCALE = 0.8  # --scale of the capstone run (ngp = world * SCALE)


def project_to_spheres(v_ngp: np.ndarray) -> np.ndarray:
    """Exact projection onto the union-of-spheres surface (nearest sphere)."""
    from nerf2mesh_tpu.data.synthetic import SphereScene
    sc = SphereScene()
    p = v_ngp.astype(np.float64) / SCALE
    d = np.stack([np.linalg.norm(p - c, axis=-1) - r
                  for c, r in zip(sc.centers, sc.radii)], -1)   # [V, S]
    best = np.argmin(np.abs(d), axis=-1)
    sd = np.min(d, axis=-1)
    c = sc.centers[best]
    r = sc.radii[best][:, None]
    n = p - c
    n /= np.maximum(np.linalg.norm(n, axis=-1, keepdims=True), 1e-12)
    proj = c + n * r
    print(f"[oracle] |sdf| before projection: mean {np.abs(sd).mean()*SCALE:.5f} "
          f"p50 {np.percentile(np.abs(sd), 50)*SCALE:.5f} "
          f"p90 {np.percentile(np.abs(sd), 90)*SCALE:.5f} "
          f"p99 {np.percentile(np.abs(sd), 99)*SCALE:.5f} (ngp units; "
          f"~{np.abs(sd).mean()*SCALE*138:.2f} px mean at z=2.24)", flush=True)
    return (proj * SCALE).astype(np.float32)


def eval_views(t1, ds_val, ds_tr, tag):
    fulls = []
    for i in range(len(ds_val.poses)):
        out = t1.render_image_stage1(
            ds_val.poses[i], ds_val.mvps[i], ds_val.intrinsics_for(i),
            ds_val.H, ds_val.W)
        fulls.append(split_metrics(out["image"], ds_val.images[i],
                                   f"{tag} val{i}", cov=out["weights_sum"]))
    out = t1.render_image_stage1(
        ds_tr.poses[0], ds_tr.mvps[0], ds_tr.intrinsics_for(0),
        ds_tr.H, ds_tr.W)
    split_metrics(out["image"], ds_tr.images[0], f"{tag} train0",
                  cov=out["weights_sum"])
    print(f"[{tag}] val mean {np.mean(fulls):.2f} dB", flush=True)
    return float(np.mean(fulls))


def set_offsets(t1, base_plus_off: np.ndarray):
    """Overwrite vertices_offsets so that mesh_v + offsets == target."""
    import jax.numpy as jnp
    v_real = t1._s1_real_shape[0]
    cur = np.asarray(t1.state.params["vertices_offsets"])
    base = np.asarray(t1.mesh_v)[:v_real]
    new = np.zeros_like(cur)
    new[:v_real] = base_plus_off - base
    params = dict(t1.state.params)
    params["vertices_offsets"] = jnp.asarray(new)
    t1.state = t1.state._replace(params=params)


def main():
    import jax.numpy as jnp

    from nerf2mesh_tpu.config import parse_args
    from nerf2mesh_tpu.data.provider import load_nerf_dataset
    from nerf2mesh_tpu.utils.trainer import Trainer

    amode = os.environ.get("ORACLE_ALPHA_EVAL", "aa")
    print(f"[oracle_probe] s1_alpha_eval={amode}", flush=True)
    cfg1 = parse_args([
        ROOT, "--workspace", WS, "--stage", "1", "--bound", "1",
        "--scale", "0.8", "--dt_gamma", "0", "--iters", "1500", "--refine",
        "--s1_alpha_eval", amode, "--test_no_video"])
    t1 = Trainer(cfg1)
    ds_tr = load_nerf_dataset(cfg1, "train")
    t1.setup_stage1(ds_tr)
    assert t1.load_checkpoint(), "no stage-1 checkpoint"
    ds_val = load_nerf_dataset(cfg1, "val")

    v_real = t1._s1_real_shape[0]
    base = np.asarray(t1.mesh_v)[:v_real]
    cur_off = np.asarray(t1.state.params["vertices_offsets"])[:v_real]
    v_current = base + cur_off

    if "A" in PHASES:
        print("== A. baseline (trained geometry)", flush=True)
        eval_views(t1, ds_val, ds_tr, "base")

    v_oracle = project_to_spheres(v_current)
    if "B" in PHASES:
        print("== B. oracle projection", flush=True)
        set_offsets(t1, v_oracle)
        eval_views(t1, ds_val, ds_tr, "oracle")

    if "C" in PHASES:
        print(f"== C. {TRAIN_STEPS} training steps from oracle", flush=True)
        set_offsets(t1, v_oracle)
        images = jnp.asarray(ds_tr.images)
        poses = jnp.asarray(ds_tr.poses)
        mvps = jnp.asarray(ds_tr.mvps)
        intrinsics = jnp.asarray(ds_tr.intrinsics)
        fn = t1._build_stage1_step()
        state, te, tc = t1.state, t1.tri_errors, t1.tri_counts
        import time
        t0 = time.time()
        for s in range(TRAIN_STEPS):
            state, te, tc, m = fn(state, te, tc, t1.mesh_v, t1.mesh_f,
                                  t1.mesh_edges, t1.mesh_deg, t1.mesh_pairs,
                                  t1.s1_counts, images, poses, mvps,
                                  intrinsics, t1.dynamics(1500 + s))
            if (s + 1) % 80 == 0:
                print(f"  step {s+1}: loss={float(m['loss']):.6f} "
                      f"psnr={float(m['psnr']):.2f} "
                      f"({time.time()-t0:.0f}s)", flush=True)
        t1.state = state
        off = np.asarray(state.params["vertices_offsets"])[:v_real]
        moved = np.linalg.norm(base + off - v_oracle, axis=-1)
        print(f"[C] vertex drift from oracle: mean {moved.mean():.5f} "
              f"p90 {np.percentile(moved, 90):.5f} "
              f"p99 {np.percentile(moved, 99):.5f} ngp units "
              f"(~{moved.mean()*138:.2f} px mean)", flush=True)
        eval_views(t1, ds_val, ds_tr, "oracle+train")


if __name__ == "__main__":
    main()
