import sys; sys.path.insert(0, "/root/repo")
"""Capstone-96 stage-1 retrain with the antialias edge pass (session 4).

Reuses the stage-0 checkpoint in /tmp/ws96 (33.14 dB).  Changes vs the
session-3 run (27.25 dB eval, soft-sigmoid silhouettes):
  * training alpha_mode="aa": hard strict coverage + analytic edge
    antialiasing (dr.antialias analog) — vertex offsets get exact
    edge-crossing gradients;
  * eval alpha_mode="hard": strict pixel-center coverage, matching the
    1-spp hard-edged procedural ground truth (the old hard mode used the
    ~1px-dilated `covered` mask);
  * 5000 iters (was 2500).
Gate: eval PSNR >= stage-0 - 1.5 dB = 31.64.
"""
import glob
import os
import time

from nerf2mesh_tpu.main import main

t0 = time.time()
ws = "/tmp/ws96"
# fresh stage-1: drop old stage-1 checkpoints + refined meshes (else
# --ckpt latest resumes the soft-alpha run / its refined topology)
for p in (glob.glob(ws + "/checkpoints/ngp_stage1_*")
          + glob.glob(ws + "/mesh_stage0/*_updated.ply")):
    os.remove(p)
    print("removed", p, flush=True)

main(["/tmp/bench_scene96", "--workspace", ws,
      "--stage", "1", "--bound", "1", "--scale", "0.8", "--dt_gamma", "0",
      "--iters", "5000", "--refine", "--texture_size", "1024", "--ssaa", "1",
      "--lr_vert", "3e-4",
      "--n_eval", "5", "--n_ckpt", "2", "--test_no_video"])
print("CAP96 S1-AA DONE %.0fs" % (time.time() - t0), flush=True)
