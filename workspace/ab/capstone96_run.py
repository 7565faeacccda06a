import sys; sys.path.insert(0, "/root/repo")
"""Two-stage capstone at reference-like view density.

The 24-view round-1 scene overfits both stages (stage-0 train 47 /
eval 31.4; stage-1 train 33 / eval 25): the reference's synthetic
benchmark trains on ~100 views of 800^2.  This run: 96 views of 256^2,
stage 0 3000 iters + stage 1 2500 full-frame iters.
"""
import os
import time

from nerf2mesh_tpu.data.synthetic import generate_synthetic_dataset
from nerf2mesh_tpu.main import main

root = "/tmp/bench_scene96"
if not os.path.exists(os.path.join(root, "transforms_train.json")):
    generate_synthetic_dataset(root, H=256, W=256, n_train=96, n_val=3,
                               n_test=3)
t0 = time.time()
main([root, "--workspace", "/tmp/ws96",
      "--bound", "1", "--scale", "0.8", "--dt_gamma", "0",
      "--iters", "3000", "--num_rays", "4096", "--num_points", "262144",
      "--grid_size", "128", "--diffuse_step", "600",
      "--random_image_batch", "--mark_untrained", "--adaptive_num_rays",
      "--mesh_visibility_culling",
      "--mcubes_reso", "256", "--decimate_target", "100000",
      "--n_eval", "2", "--n_ckpt", "2", "--test_no_video"])
print("CAP96 STAGE0 DONE %.0fs" % (time.time() - t0), flush=True)
main([root, "--workspace", "/tmp/ws96",
      "--stage", "1", "--bound", "1", "--scale", "0.8", "--dt_gamma", "0",
      "--iters", "2500", "--lr_vert", "3e-4", "--refine",
      "--texture_size", "1024", "--ssaa", "1",
      "--n_eval", "2", "--n_ckpt", "2", "--test_no_video"])
print("CAP96 ALL DONE %.0fs" % (time.time() - t0), flush=True)
