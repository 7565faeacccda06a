"""Stage-1 quality gate in the CAPSTONE regime (VERDICT r4 task 7).

Four rounds of capstone failures were each discovered on expensive chip
runs because the only stage-1 quality test ran a toy scene with a -2 dB
allowance.  This test reproduces the failing regime's ingredients at CPU
scale: a CONVERGED stage-0 (the field has a real density ramp), the
mesh-prep SHARPEN phase, a dense marching-cubes mesh with surface snap,
thin-shell stage-1 shading, full shading from step 0, held-out-view eval.

Round-5 state (workspace/validation/round5/RESULTS.md): the round-4
mechanism — held-out PSNR DECLINING during stage-1 training, caused by
surface-point shading of a soft volumetric field — is cured by the
sharpen+shell pipeline (capstone v9 30.13-and-declining -> v11 35.07-and-
rising vs stage-0 40.6).  The remaining capstone deficit is -5.5 dB, so
this test gates the CURED mechanism, not the aspirational -1 dB parity:
  (a) stage-1 must not DECLINE over training (the v9 signature),
  (b) stage-1 must stay within 6.5 dB of stage-0 (capstone-demonstrated
      capability + margin; tighten as the capstone gap closes).
"""
import dataclasses
import os

import numpy as np
import pytest


@pytest.mark.slow
def test_stage1_matches_stage0_on_converged_scene(tmp_path):
    from nerf2mesh_tpu.config import Config
    from nerf2mesh_tpu.data.provider import load_nerf_dataset
    from nerf2mesh_tpu.data.synthetic import generate_synthetic_dataset
    from nerf2mesh_tpu.utils.metrics import PSNRMeter
    from nerf2mesh_tpu.utils.trainer import Trainer

    root = str(tmp_path / "scene")
    # ssaa-2 GT: binary-rim GT distorts the gate (synthetic.py docstring)
    generate_synthetic_dataset(root, H=96, W=96, n_train=24, n_val=2,
                               n_test=2, ssaa=2)

    base = dict(
        bound=1.0, scale=0.8, dt_gamma=0.0, num_rays=2048,
        num_points=65536, max_steps=96, grid_size=64,
        diffuse_step=150, random_image_batch=True, mark_untrained=True,
        background="random", n_eval=1, n_ckpt=1)

    ws = str(tmp_path / "ws")
    cfg0 = dataclasses.replace(
        Config(path=root, workspace=ws), iters=600, sharpen_steps=300,
        **base).finalize()
    tr0 = Trainer(cfg0)
    ds = load_nerf_dataset(cfg0, "train")
    val = load_nerf_dataset(cfg0, "val")
    tr0.metrics = [PSNRMeter()]
    tr0.train(ds, None)
    s0 = tr0.evaluate(val, name="gate_s0")["PSNR"]
    # production recipe: mesh-prep sharpen phase after the quality eval
    # (main.py runs this when sharpen_steps > 0 / under -O)
    tr0.train(ds, None, max_steps=cfg0.iters + cfg0.sharpen_steps)
    tr0.save_checkpoint()
    tr0.save_mesh(resolution=128, dataset=ds)

    # exact shell at miniature scale: the stochastic layer noise needs
    # more steps than this CPU budget to average out (chip capstones use
    # --s1_stochastic; here the crop is small enough for the exact path)
    cfg1 = dataclasses.replace(
        Config(path=root, workspace=ws), iters=450, stage=1,
        s1_vert_boost=2.0, s1_shell=4, s1_shell_h=0.08,
        **base).finalize()
    tr1 = Trainer(cfg1)
    tr1.setup_stage1(ds)
    assert tr1.load_checkpoint(stage=0)
    tr1.metrics = [PSNRMeter()]
    tr1.train_stage1(ds, None, max_steps=225)
    s1_mid = tr1.evaluate(val, name="gate_s1_mid", track_best=False)["PSNR"]
    tr1.train_stage1(ds, None)
    s1 = tr1.evaluate(val, name="gate_s1")["PSNR"]

    print(f"[gate] stage0 {s0:.2f} dB | stage1 mid {s1_mid:.2f} "
          f"final {s1:.2f} dB")
    assert s0 > 26.0, f"stage-0 miniature failed to converge ({s0:.2f})"
    # (a) the v9 decline signature must stay dead
    assert s1 >= s1_mid - 0.75, (
        f"stage-1 DECLINED over training ({s1_mid:.2f} -> {s1:.2f}): the "
        f"round-4 soft-field/surface-sampling regression is back")
    # (b) demonstrated-capability bound (capstone v11: stage-0 - 5.5 dB)
    assert s1 >= s0 - 6.5, (
        f"stage-1 {s1:.2f} vs stage-0 {s0:.2f}: worse than the "
        f"sharpen+shell pipeline's demonstrated capability")
