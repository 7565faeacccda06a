import sys; sys.path.insert(0, "/root/repo")
"""Capstone-96 full two-stage run with the session-4 silhouette fixes.

Changes vs the session-3 27.25 dB run:
  * GT rendered with ssaa=3 (alpha-premultiplied 9-subsample average) —
    reference-parity antialiased silhouettes; the old 1-spp binary rim
    accounted for 86% of stage-1 eval MSE in 3% of pixels.
  * stage-1 training alpha_mode="aa" (hard strict coverage + analytic
    dr.antialias-style edge pass; default since session 4) and eval
    alpha_mode="aa" to match the soft GT rim.
  * stage-1 5000 iters (was 2500).
Gate (VERDICT item 1): stage-1 eval PSNR >= stage-0 eval - 1.5 dB.
"""
import os
import time

from nerf2mesh_tpu.data.synthetic import generate_synthetic_dataset
from nerf2mesh_tpu.main import main

root = "/tmp/bench_scene96aa"
if not os.path.exists(os.path.join(root, "transforms_train.json")):
    t = time.time()
    generate_synthetic_dataset(root, H=256, W=256, n_train=96, n_val=3,
                               n_test=3, ssaa=3)
    print("GT generated %.0fs" % (time.time() - t), flush=True)

t0 = time.time()
main([root, "--workspace", "/tmp/ws96aa",
      "--bound", "1", "--scale", "0.8", "--dt_gamma", "0",
      "--iters", "3000", "--num_rays", "4096", "--num_points", "262144",
      "--grid_size", "128", "--diffuse_step", "600",
      "--random_image_batch", "--mark_untrained", "--adaptive_num_rays",
      "--mesh_visibility_culling",
      "--mcubes_reso", "256", "--decimate_target", "100000",
      "--n_eval", "2", "--n_ckpt", "2", "--test_no_video"])
print("CAP96AA STAGE0 DONE %.0fs" % (time.time() - t0), flush=True)
main([root, "--workspace", "/tmp/ws96aa",
      "--stage", "1", "--bound", "1", "--scale", "0.8", "--dt_gamma", "0",
      "--iters", "5000", "--lr_vert", "3e-4", "--refine",
      "--texture_size", "1024", "--ssaa", "1", "--s1_alpha_eval", "aa",
      "--n_eval", "4", "--n_ckpt", "2", "--test_no_video"])
print("CAP96AA ALL DONE %.0fs" % (time.time() - t0), flush=True)
