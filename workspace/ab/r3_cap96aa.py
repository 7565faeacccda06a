"""Round-3 resume of the trimmed capstone-96aa (stage-1 AA validation).

State on entry (workspace/runs/ws96aa): stage-0 trained to step 1500
(eval PSNR 38.34 on the ssaa=3 AA GT), but the round-2 run died before
mesh export — no mesh_stage0/.  This script:
  1. stage-0 `--test` pass: test-split eval (stage-0 gate number) + mesh
     export with visibility culling (skipped if mesh_0.ply exists);
  2. stage-1 1500 iters with alpha_mode=aa eval, full-frame crops,
     resuming `--ckpt latest` (stage-1 ckpt if present, else stage-0).

Gate read (VERDICT r2 #1): stage-1 final eval >= stage-0 eval - 1 dB on
the SAME AA GT.  NOTE: evals right after a refine read ~2-3 dB low —
judge by the final/best eval only.
"""
import sys

sys.path.insert(0, "/root/repo")

import os
import time

from nerf2mesh_tpu.main import main

root = "/root/repo/workspace/runs/scene96aa"
ws = "/root/repo/workspace/runs/ws96aa"
assert os.path.exists(os.path.join(root, "transforms_train.json"))

t0 = time.time()
if not os.path.exists(os.path.join(ws, "mesh_stage0", "mesh_0.ply")):
    main([root, "--workspace", ws, "--test", "--test_no_video",
          "--bound", "1", "--scale", "0.8", "--dt_gamma", "0",
          "--num_rays", "4096", "--num_points", "262144",
          "--grid_size", "128",
          "--random_image_batch", "--mark_untrained", "--adaptive_num_rays",
          "--mesh_visibility_culling",
          "--mcubes_reso", "256", "--decimate_target", "100000"])
    print("R3 STAGE0 EXPORT DONE %.0fs" % (time.time() - t0), flush=True)

s1_done = os.path.join(ws, "checkpoints")
main([root, "--workspace", ws,
      "--stage", "1", "--bound", "1", "--scale", "0.8", "--dt_gamma", "0",
      "--iters", "1500", "--lr_vert", "3e-4", "--refine",
      "--texture_size", "1024", "--ssaa", "1", "--s1_alpha_eval", "aa",
      "--n_eval", "4", "--n_ckpt", "4", "--test_no_video"])
print("R3 CAP96AA ALL DONE %.0fs" % (time.time() - t0), flush=True)
