"""Unbounded / cascaded path at chip scale (VERDICT r2 #5, second half).

The CPU half lives in tests/test_cascade_e2e.py; this takes the same
composition to the chip at real resolution: procedural COLMAP-format scene
with background geometry (env sphere) -> data/colmap.py provider (pose
centering, pts_aabb, per-view near/far) -> bound 4 training with cascade
occupancy -> inner + outer cascade mesh export -> stage-1 over the
multi-cascade mesh set -> web export.  Mirrors the reference's LLFF recipe
shape (scripts/runall_llff.sh; outer-cascade export renderer.py:606-672).

Snapshots log+metrics into workspace/validation/round5/.
"""
import sys

sys.path.insert(0, "/root/repo")

import os
import shutil
import time

from nerf2mesh_tpu.data.synthetic import generate_colmap_dataset
from nerf2mesh_tpu.main import main

root = "/root/repo/workspace/runs/colmap_scene"
ws = "/root/repo/workspace/runs/ws_colmap"
snap = "/root/repo/workspace/validation/round5"
os.makedirs(snap, exist_ok=True)

if not os.path.exists(os.path.join(root, "sparse", "0", "cameras.bin")):
    t = time.time()
    generate_colmap_dataset(root, H=256, W=256, n_images=48, n_points=4000)
    print("COLMAP GT generated %.0fs" % (time.time() - t), flush=True)

t0 = time.time()
if not os.path.exists(os.path.join(ws, "mesh_stage0", "mesh_0.ply")):
    main([root, "--workspace", ws, "--data_format", "colmap",
          "--bound", "4", "--scale", "1", "--dt_gamma", "0.0078",
          "--iters", "1500", "--sharpen_steps", "1200",
          "--num_rays", "4096", "--num_points", "262144",
          "--grid_size", "128", "--diffuse_step", "400",
          "--random_image_batch", "--mark_untrained", "--adaptive_num_rays",
          "--mesh_visibility_culling",
          "--mcubes_reso", "256", "--env_reso", "128",
          "--decimate_target", "100000",
          "--n_eval", "2", "--n_ckpt", "2", "--test_no_video"])
    print("COLMAP STAGE0 DONE %.0fs" % (time.time() - t0), flush=True)
    mdir = os.path.join(ws, "mesh_stage0")
    print("cascade meshes:", sorted(os.listdir(mdir)), flush=True)

# stage-1 ssaa/lr_vert defaults match the toy-gate-validated config
main([root, "--workspace", ws, "--data_format", "colmap",
      "--stage", "1", "--bound", "4", "--scale", "1", "--dt_gamma", "0.0078",
      "--iters", "800", "--refine",
      "--s1_shell", "4", "--s1_shell_h", "0.02", "--s1_stochastic",
      "--texture_size", "1024", 
      "--n_eval", "2", "--n_ckpt", "2", "--test_no_video"])
print("COLMAP ALL DONE %.0fs" % (time.time() - t0), flush=True)

for name in ("log_ngp.txt", "metrics.jsonl"):
    p = os.path.join(ws, name)
    if os.path.exists(p):
        shutil.copy(p, os.path.join(snap, f"colmap_chip_{name}"))
