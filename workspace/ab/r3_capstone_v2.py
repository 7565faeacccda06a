"""Round-3 capstone v2: same 96-view AA recipe as r3_capstone_full.py but
with the fp32 geometry-precision fix (commit 3ff6abb) — stage 0 retrains
from scratch in a FRESH workspace (the v1 field learned bf16-warped rays;
its checkpoints are poisoned for stage-1 purposes).

v1 result (pre-fix): stage-0 38.19 / stage-1 27.997 (gate FAIL, -10.2 dB).
GATE: stage-1 final eval >= stage-0 test eval - 1 dB.
"""
import sys

sys.path.insert(0, "/root/repo")

import os
import shutil
import time

from nerf2mesh_tpu.data.synthetic import generate_synthetic_dataset
from nerf2mesh_tpu.main import main

root = "/root/repo/workspace/runs/scene96aa"
ws = "/root/repo/workspace/runs/ws96v2"
snap = "/root/repo/workspace/validation/round3"
os.makedirs(snap, exist_ok=True)


def snapshot(tag):
    for name in ("log_ngp.txt", "metrics.jsonl"):
        p = os.path.join(ws, name)
        if os.path.exists(p):
            shutil.copy(p, os.path.join(snap, f"cap96v2_{tag}_{name}"))
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
    print("V2 STAGE0 DONE %.0fs" % (time.time() - t0), flush=True)
    snapshot("stage0")

if os.environ.get("CAPV2_STAGE0_ONLY", "0") == "1":
    print("V2 stage-0 only (CAPV2_STAGE0_ONLY=1); exiting", flush=True)
    sys.exit(0)

# stage 1 uses the toy-gate-validated config (s1_cpu_debug, round-3): default
# ssaa=2 (drives the face budget AND the supersampled eval), default
# lr_vert=1e-4 with the boosted decaying schedule (s1_vert_boost=30).
main([root, "--workspace", ws,
      "--stage", "1", "--bound", "1", "--scale", "0.8", "--dt_gamma", "0",
      "--iters", "1500", "--refine",
      "--texture_size", "1024", "--s1_alpha_eval", "aa",
      "--n_eval", "4", "--n_ckpt", "4", "--test_no_video"])
print("V2 CAP ALL DONE %.0fs" % (time.time() - t0), flush=True)
snapshot("stage1")
