"""Trimmed capstone-96aa: validate the session-4 silhouette-AA stack
(ssaa=3 antialiased GT + alpha_mode="aa" train/eval) within one session.

Budget cuts vs cap96_aa_full.py (which needs ~2h): stage-0 1500 iters
(previous 96-view run read 32.2 dB at step 1500 on hard GT), stage-1 1500
iters.  Workspace + dataset persist under /root/repo/workspace/runs so a
later session can resume/extend (previous attempts died with /tmp).

Gate read: stage-1 eval vs stage-0 eval on the SAME (AA) GT; round-2
session-3 state was stage-0 33.1 / stage-1 27.25 with 86% of the gap in
the silhouette rim band.
"""
import sys

sys.path.insert(0, "/root/repo")

import os
import time

from nerf2mesh_tpu.data.synthetic import generate_synthetic_dataset
from nerf2mesh_tpu.main import main

root = "/root/repo/workspace/runs/scene96aa"
ws = "/root/repo/workspace/runs/ws96aa"
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
          "--grid_size", "128", "--diffuse_step", "600",
          "--random_image_batch", "--mark_untrained", "--adaptive_num_rays",
          "--mesh_visibility_culling",
          "--mcubes_reso", "256", "--decimate_target", "100000",
          "--n_eval", "2", "--n_ckpt", "2", "--test_no_video"])
    print("CAP96AA-SHORT STAGE0 DONE %.0fs" % (time.time() - t0), flush=True)
main([root, "--workspace", ws,
      "--stage", "1", "--bound", "1", "--scale", "0.8", "--dt_gamma", "0",
      "--iters", "1500", "--lr_vert", "3e-4", "--refine",
      "--texture_size", "1024", "--ssaa", "1", "--s1_alpha_eval", "aa",
      "--n_eval", "4", "--n_ckpt", "4", "--test_no_video"])
print("CAP96AA-SHORT ALL DONE %.0fs" % (time.time() - t0), flush=True)
