import sys; sys.path.insert(0, "/root/repo")
"""Eval-protocol probe: is the capstone stage-1 'gap' an artifact of 1-spp
hard-edged procedural GT?

The reference's nerf-synthetic GT images are ANTIALIASED blender renders and
its stage-1 renders always apply dr.antialias (renderer.py:884-887) — the
benchmark never compares a hard binary rim against a blended one.  Our
procedural generator traced ONE ray per pixel (binary alpha rim), so every
silhouette contributes a band of unmatched binary pixels to the MSE no
matter how well the mesh is placed.  The clean AA retrain converged to
24.07 eval (hard-vs-hard), with interior-only PSNR far above it — same
signature as session 3.

This probe re-scores the EXISTING trained capstone checkpoints (stage 0 +
stage 1 in /tmp/ws96) against a 4-spp supersampled regeneration of the SAME
scene/poses (/tmp/bench_scene96_aa, generate_synthetic_dataset(ssaa=4)),
with the stage-1 render in each alpha mode (aa | hard).  If the s1-vs-s0
gap closes under the consistent protocol, the fix is to make ssaa>=3 GT the
capstone default (reference parity), not to chase rim placement further.
"""
import dataclasses
import os

import numpy as np


def main():
    import jax  # noqa: F401
    from nerf2mesh_tpu.config import Config
    from nerf2mesh_tpu.data.provider import load_nerf_dataset
    from nerf2mesh_tpu.utils.trainer import Trainer

    ws = "/tmp/ws96"
    base = dict(bound=1.0, scale=0.8, dt_gamma=0.0, grid_size=128,
                iters=5000, texture_size=1024, ssaa=1, workspace=ws)

    def cfg_for(path, **kw):
        return dataclasses.replace(Config(path=path), **base, **kw).finalize()

    results = {}

    # ---- stage 0 vs both GTs
    for tag, path in (("hard", "/tmp/bench_scene96"),
                      ("aa4", "/tmp/bench_scene96_aa")):
        cfg = cfg_for(path)
        ds = load_nerf_dataset(cfg, "val")
        tr = Trainer(cfg)
        assert tr.load_checkpoint(
            os.path.join(ws, "checkpoints", "ngp_stage0_best.ckpt"))
        r = tr.evaluate(ds, name=f"s0_vs_{tag}")
        results[f"s0_{tag}"] = r["PSNR"]

    # ---- stage 1 (AA-trained, final ckpt) vs both GTs in both alpha modes
    for tag, path in (("hard", "/tmp/bench_scene96"),
                      ("aa4", "/tmp/bench_scene96_aa")):
        for amode in ("aa", "hard"):
            cfg = cfg_for(path, stage=1, s1_alpha_eval=amode)
            ds = load_nerf_dataset(cfg, "val")
            tr = Trainer(cfg)
            assert tr.load_checkpoint(
                os.path.join(ws, "checkpoints", "ngp_stage1_latest.ckpt"))
            tr.setup_stage1(ds)
            r = tr.evaluate(ds, name=f"s1_{amode}_vs_{tag}", stage1=True)
            results[f"s1_{amode}_{tag}"] = r["PSNR"]

    print("\n==== eval protocol probe ====")
    for k, v in results.items():
        print(f"{k:>16}: {v:.2f} dB")
    g_hard = results["s0_hard"] - results["s1_hard_hard"]
    g_aa = results["s0_aa4"] - results["s1_aa_aa4"]
    print(f"gap hard-protocol: {g_hard:.2f} dB | aa4-protocol: {g_aa:.2f} dB")


if __name__ == "__main__":
    main()
