import sys; sys.path.insert(0, "/root/repo")
"""Resume the cap96aa stage-1 run after the relay hard-stall at step 2500
(same flags as cap96_aa_full.py stage 1; --ckpt latest resumes from the
step-2500 stage-1 checkpoint with the refined 231k-face mesh)."""
import time

from nerf2mesh_tpu.main import main

root = "/tmp/bench_scene96aa"
t0 = time.time()
main([root, "--workspace", "/tmp/ws96aa",
      "--stage", "1", "--bound", "1", "--scale", "0.8", "--dt_gamma", "0",
      "--iters", "5000", "--lr_vert", "3e-4", "--refine",
      "--texture_size", "1024", "--ssaa", "1", "--s1_alpha_eval", "aa",
      "--n_eval", "4", "--n_ckpt", "2", "--test_no_video"])
print("CAP96AA S1 RESUME DONE %.0fs" % (time.time() - t0), flush=True)
