"""Round-5 capstone v10: the first arm that combines the FULL round-4 fix
stack (VERDICT r4 task 2) — area+union16 estimator, exact stage-1 encode,
schedule-count fix WITH the donation-aliasing fix, full shading from step 0,
wide 3-pass surface snap (now persisted to mesh_0_updated.ply) — with
per-checkpoint TRAIN-VIEW diag evals through the eval path, so the
train-print-vs-held-out gap decomposes into estimator asymmetry vs view
overfitting at every eval point (VERDICT r4 task 3a).

Arms (env CAP10_ARM):
  norefine  — v9-config rerun (1500 iters, vert boost 2, no refines)
  refine    — v9 config + refines (the "v7-style refine arm with the full
              fix stack" the round-4 TODO queued; refines crash at HEAD~1
              without the donation fix)
  shell     — norefine + thin-shell surface shading (--s1_shell), the
              round-5 fix candidate for the interior speckle (v9 held-out
              MSE is 78-92% interior)

GATE: stage-1 final val eval >= stage-0 test (40.598) - 1 dB.

Reference contract: /root/reference/nerf/renderer.py:816-921 (stage-1
trains THROUGH the rasterized surface), main.py:239 (fresh scheduler).
"""
import sys

sys.path.insert(0, "/root/repo")

import dataclasses
import json
import os
import shutil
import time

import numpy as np

ARM = os.environ.get("CAP10_ARM", "norefine")
ROOT = "/root/repo/workspace/runs/scene96aa"
SRC_WS = "/root/repo/workspace/runs/ws96v9"
WS = f"/root/repo/workspace/runs/ws96v10_{ARM}"
SNAP = "/root/repo/workspace/validation/round5"
os.makedirs(SNAP, exist_ok=True)

# fresh workspace seeded with stage-0 ckpt + BASE mesh only
shutil.rmtree(WS, ignore_errors=True)
os.makedirs(os.path.join(WS, "checkpoints"))
os.makedirs(os.path.join(WS, "mesh_stage0"))
for name in ("ngp_stage0_latest.ckpt", "ngp_stage0_best.ckpt"):
    shutil.copy(os.path.join(SRC_WS, "checkpoints", name),
                os.path.join(WS, "checkpoints", name))
shutil.copy(os.path.join(SRC_WS, "mesh_stage0", "mesh_0.ply"),
            os.path.join(WS, "mesh_stage0", "mesh_0.ply"))

from nerf2mesh_tpu.config import parse_args
from nerf2mesh_tpu.data.provider import load_nerf_dataset
from nerf2mesh_tpu.utils.metrics import PSNRMeter
from nerf2mesh_tpu.utils.trainer import Trainer

args = [ROOT, "--workspace", WS,
        "--stage", "1", "--bound", "1", "--scale", "0.8", "--dt_gamma", "0",
        "--iters", os.environ.get("CAP10_ITERS", "1500"),
        "--s1_vert_boost", "2",
        "--texture_size", "1024",
        "--s1_alpha", os.environ.get("CAP10_ALPHA", "area"),
        "--n_eval", "4", "--n_ckpt", "4", "--test_no_video"]
if ARM == "refine":
    args += ["--refine"]
elif ARM.startswith("shell"):
    args += ["--s1_shell", os.environ.get("CAP10_SHELL_K", "4"),
             "--s1_shell_h", os.environ.get("CAP10_SHELL_H", "0.03")]
    if "stoch" in ARM:
        # stochastic 1-corner encode for the K shell layers: 8.5x cheaper
        # per layer; the shell average damps the v6 single-sample noise
        args += ["--s1_stochastic"]
cfg = parse_args(args)

t0 = time.time()
tr = Trainer(cfg)
train_ds = load_nerf_dataset(cfg, "train")
tr.setup_stage1(train_ds)
if not tr.load_checkpoint():
    assert tr.load_checkpoint(stage=0), "no stage-0 checkpoint"
valid_ds = load_nerf_dataset(cfg, "val")

# 4 train views as a diag eval set (same eval path; separates estimator
# asymmetry from view overfitting). Spread across the orbit.
sel = np.linspace(0, train_ds.num_frames - 1, 4).astype(int)
train4 = dataclasses.replace(
    train_ds, poses=train_ds.poses[sel], images=train_ds.images[sel],
    mvps=train_ds.mvps[sel],
    intrinsics=(train_ds.intrinsics[sel]
                if np.asarray(train_ds.intrinsics).ndim == 2
                else train_ds.intrinsics),
    training=False)

tr.metrics = [PSNRMeter()]
tr.train_stage1(train_ds, valid_ds, diag_datasets={"train4": train4})

from nerf2mesh_tpu.utils.metrics import LPIPSMeter, SSIMMeter
tr.metrics = [PSNRMeter(), SSIMMeter(), LPIPSMeter()]
res_val = tr.evaluate(valid_ds, name="val_final", write_images=True)
test_ds = load_nerf_dataset(cfg, "test")
res_test = tr.evaluate(test_ds, name="test", write_images=True)
res_tr4 = tr.evaluate(train4, name="train4_final", track_best=False)
tr.export_stage1(resolution=cfg.texture_size)

out = {"arm": ARM, "val": res_val, "test": res_test, "train4": res_tr4,
       "secs": round(time.time() - t0, 1)}
print("V10 RESULT " + json.dumps(out), flush=True)
for name in ("log_ngp.txt", "metrics.jsonl"):
    p = os.path.join(WS, name)
    if os.path.exists(p):
        shutil.copy(p, os.path.join(SNAP, f"cap96v10{ARM}_stage1_{name}"))
with open(os.path.join(SNAP, f"cap96v10{ARM}_result.json"), "w") as f:
    json.dump(out, f, indent=1)
print("V10 CAP DONE %.0fs" % (time.time() - t0), flush=True)
