# Capstone validation run (round 1): two-stage pipeline at realistic scale
# on the 256^2 procedural scene.  Stage-0 result: eval PSNR 31.03/SSIM 0.990.
# Stage-1 ran pre-rasterizer-fix (see TODO.md item 0) and needs a rerun.
# Generate the scene first:
#   python -c "from nerf2mesh_tpu.data.synthetic import generate_synthetic_dataset as g; g('/tmp/bench_scene', H=256, W=256, n_train=24, n_val=2, n_test=2)"
import sys, time; sys.path.insert(0,"/root/repo")
import jax
from nerf2mesh_tpu.main import main
t0 = time.time()
# stage 0: 3000 iters at realistic settings on the 256^2 synthetic scene
main(["/tmp/bench_scene", "--workspace", "/tmp/ws_full",
      "--bound", "1", "--scale", "0.8", "--dt_gamma", "0",
      "--iters", "3000", "--num_rays", "2048", "--num_points", "65536",
      "--grid_size", "128", "--diffuse_step", "500",
      "--random_image_batch", "--mark_untrained", "--adaptive_num_rays",
      "--mesh_visibility_culling",
      "--mcubes_reso", "256", "--decimate_target", "100000",
      "--n_eval", "2", "--n_ckpt", "2", "--test_no_video"])
print("STAGE0 DONE %.0fs" % (time.time()-t0), flush=True)
# stage 1: 1000 iters + refine + export
main(["/tmp/bench_scene", "--workspace", "/tmp/ws_full",
      "--stage", "1", "--bound", "1", "--scale", "0.8", "--dt_gamma", "0",
      "--iters", "1000", "--refine", "--texture_size", "1024", "--ssaa", "1",
      "--n_eval", "2", "--n_ckpt", "2", "--test_no_video"])
print("ALL DONE %.0fs" % (time.time()-t0), flush=True)
