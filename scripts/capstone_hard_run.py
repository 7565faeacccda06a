# Capstone validation on the HARD proxy scene (textures, thin rods,
# speculars): the closest available stand-in for the unfetchable
# nerf-synthetic benchmark (see BASELINE.md "Real-dataset availability").
# Two-stage -O-equivalent recipe at 256^2; reports stage-0/stage-1 eval
# PSNR/SSIM/LPIPS(proxy) and exports the web package.
import sys, time; sys.path.insert(0, "/root/repo")
from nerf2mesh_tpu.data.synthetic import HardScene, generate_synthetic_dataset
import os
root = "/tmp/hard_scene_ds"
if not os.path.exists(os.path.join(root, "transforms_train.json")):
    generate_synthetic_dataset(root, scene=HardScene(), H=256, W=256,
                               n_train=48, n_val=3, n_test=3)
from nerf2mesh_tpu.main import main
t0 = time.time()
main([root, "--workspace", "/tmp/ws_hard",
      "--bound", "1", "--scale", "0.8", "--dt_gamma", "0",
      "--iters", "4000", "--num_rays", "4096", "--num_points", "262144",
      "--grid_size", "128", "--diffuse_step", "1000",
      "--random_image_batch", "--mark_untrained", "--adaptive_num_rays",
      "--mesh_visibility_culling",
      "--mcubes_reso", "256", "--decimate_target", "100000",
      "--n_eval", "2", "--n_ckpt", "2", "--test_no_video"])
print("STAGE0 DONE %.0fs" % (time.time()-t0), flush=True)
main([root, "--workspace", "/tmp/ws_hard",
      "--stage", "1", "--bound", "1", "--scale", "0.8", "--dt_gamma", "0",
      "--iters", "1500", "--refine", "--texture_size", "1024", "--ssaa", "1",
      "--n_eval", "2", "--n_ckpt", "2", "--test_no_video"])
print("ALL DONE %.0fs" % (time.time()-t0), flush=True)
