"""Round-3 capstone-96aa, fully from scratch (container reset wiped the
round-2/3-session-1 workspaces).

Recipe (validated pieces from round-2 RESULTS.md + r3 session 1):
  0. generate scene96aa: 96 train views, 256^2, ssaa=3 AA ground truth
     (the 1-spp binary rim accounted for 86% of the old stage-1 MSE);
  1. stage 0: 1500 iters (r3 session 1 measured test PSNR 38.34 at this
     budget on this GT), mesh export 256^3 mcubes -> 100k faces with
     visibility culling;
  2. stage 1: 1500 iters, alpha_mode=aa train+eval, full-frame crops,
     lr_vert 3e-4, --refine.

GATE (VERDICT r2 #1): stage-1 final eval >= stage-0 test eval - 1 dB.
NOTE: evals right after a refine read ~2-3 dB low — judge by final only.

Every milestone snapshots log+metrics into workspace/validation/round3/
so a container reset cannot lose the evidence again.
"""
import sys

sys.path.insert(0, "/root/repo")

import os
import shutil
import time

from nerf2mesh_tpu.data.synthetic import generate_synthetic_dataset
from nerf2mesh_tpu.main import main

root = "/root/repo/workspace/runs/scene96aa"
ws = "/root/repo/workspace/runs/ws96aa"
snap = "/root/repo/workspace/validation/round3"
os.makedirs(snap, exist_ok=True)


def snapshot(tag):
    for name in ("log_ngp.txt", "metrics.jsonl"):
        p = os.path.join(ws, name)
        if os.path.exists(p):
            shutil.copy(p, os.path.join(snap, f"cap96aa_{tag}_{name}"))
    print(f"[snapshot] {tag}", flush=True)


if not os.path.exists(os.path.join(root, "transforms_train.json")):
    t = time.time()
    generate_synthetic_dataset(root, H=256, W=256, n_train=96, n_val=3,
                               n_test=3, ssaa=3)
    print("GT generated %.0fs" % (time.time() - t), flush=True)

t0 = time.time()
if not os.path.exists(os.path.join(ws, "mesh_stage0", "mesh_0.ply")):
    main([root, "--workspace", ws,
          "--bound", "1", "--scale", "0.8", "--dt_gamma", "0",
          "--iters", "1500", "--num_rays", "4096", "--num_points", "262144",
          "--grid_size", "128", "--diffuse_step", "400",
          "--random_image_batch", "--mark_untrained", "--adaptive_num_rays",
          "--mesh_visibility_culling",
          "--mcubes_reso", "256", "--decimate_target", "100000",
          "--n_eval", "2", "--n_ckpt", "2", "--test_no_video"])
    print("R3 STAGE0 DONE %.0fs" % (time.time() - t0), flush=True)
    snapshot("stage0")

main([root, "--workspace", ws,
      "--stage", "1", "--bound", "1", "--scale", "0.8", "--dt_gamma", "0",
      "--iters", "1500", "--lr_vert", "3e-4", "--refine",
      "--texture_size", "1024", "--ssaa", "1", "--s1_alpha_eval", "aa",
      "--n_eval", "4", "--n_ckpt", "4", "--test_no_video"])
print("R3 CAP96AA ALL DONE %.0fs" % (time.time() - t0), flush=True)
snapshot("stage1")
