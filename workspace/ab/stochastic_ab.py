# A/B: --stochastic_fine quality cost on the hard proxy scene (PERF.md:
# train-only 1-corner sampling of gather-routed fine hash levels cuts the
# dominant random-row traffic 8x; this run decides whether it can default on).
# Usage: python workspace/ab/stochastic_ab.py [A|B]
#   A = exact fine levels (default config), B = --stochastic_fine
import os
import sys
import time

sys.path.insert(0, "/root/repo")

from nerf2mesh_tpu.data.synthetic import HardScene, generate_synthetic_dataset
from nerf2mesh_tpu.main import main

arm = (sys.argv[1] if len(sys.argv) > 1 else "B").upper()
root = "/tmp/hard_scene_ds"
if not os.path.exists(os.path.join(root, "transforms_train.json")):
    generate_synthetic_dataset(root, scene=HardScene(), H=256, W=256,
                               n_train=48, n_val=3, n_test=3)

ws = f"/tmp/ws_hard_{arm}"
extra = ["--stochastic_fine"] if arm == "B" else []
t0 = time.time()
main([root, "--workspace", ws,
      "--bound", "1", "--scale", "0.8", "--dt_gamma", "0",
      "--iters", "2000", "--num_rays", "4096", "--num_points", "262144",
      "--grid_size", "128", "--diffuse_step", "1000",
      "--random_image_batch", "--mark_untrained", "--adaptive_num_rays",
      "--mesh_visibility_culling",
      "--mcubes_reso", "256", "--decimate_target", "100000",
      "--n_eval", "2", "--n_ckpt", "2", "--test_no_video"] + extra)
print(f"AB[{arm}] STAGE0 DONE %.0fs" % (time.time() - t0), flush=True)
