import sys; sys.path.insert(0, "/root/repo")
"""Hard-proxy FULL two-stage recipe (VERDICT item 4 / TODO 7).

The real benchmark datasets (nerf-synthetic lego etc.) cannot be fetched in
this environment (zero egress; documented in BASELINE.md).  This runs the
`-O`-equivalent two-stage recipe end-to-end on the HardScene procedural
stand-in (checker-textured boxes, 0.015-radius rods, Blinn-Phong speculars)
and reports stage-0/stage-1 PSNR/SSIM/LPIPS(proxy) + exports the full web
package (OBJ/MTL/JPG textures/mlp.json).

Numbers are labeled 'hard-proxy' everywhere — never compared 1:1 with
published lego results.
"""
import os
import time

from nerf2mesh_tpu.data.synthetic import HardScene, generate_synthetic_dataset
from nerf2mesh_tpu.main import main

root = "/root/repo/workspace/runs/hard_scene"
if not os.path.exists(os.path.join(root, "transforms_train.json")):
    t = time.time()
    generate_synthetic_dataset(root, scene=HardScene(), H=256, W=256,
                               n_train=100, n_val=4, n_test=8, ssaa=3)
    print("HARD GT generated %.0fs" % (time.time() - t), flush=True)

ws = "/root/repo/workspace/runs/ws_hard"
snap = "/root/repo/workspace/validation/round5"
os.makedirs(snap, exist_ok=True)
ITERS0 = int(os.environ.get("HARD_ITERS0", "5000"))
t0 = time.time()
if not os.path.exists(os.path.join(ws, "mesh_stage0", "mesh_0.ply")):
    main([root, "--workspace", ws,
          "--bound", "1", "--scale", "0.8", "--dt_gamma", "0",
          "--iters", str(ITERS0), "--sharpen_steps", "1200",
          "--num_rays", "4096",
          "--num_points", "262144",
          "--grid_size", "128", "--diffuse_step", "1000",
          "--random_image_batch", "--mark_untrained", "--adaptive_num_rays",
          "--mesh_visibility_culling",
          "--mcubes_reso", "256", "--decimate_target", "100000",
          "--n_eval", "2", "--n_ckpt", "2", "--test_no_video"])
    print("HARD STAGE0 DONE %.0fs" % (time.time() - t0), flush=True)
    import shutil
    for name in ("log_ngp.txt", "metrics.jsonl"):
        p = os.path.join(ws, name)
        if os.path.exists(p):
            shutil.copy(p, os.path.join(snap, f"hard_stage0_{name}"))
# stage-1 config matches the toy-gate-validated defaults (ssaa 2 drives the
# face budget + supersampled eval; lr_vert 1e-4 under the boosted schedule)
main([root, "--workspace", ws,
      "--stage", "1", "--bound", "1", "--scale", "0.8", "--dt_gamma", "0",
      "--iters", "1500", "--refine",
      "--s1_shell", "4", "--s1_shell_h", "0.02", "--s1_stochastic",
      "--texture_size", "2048",
      "--n_eval", "4", "--n_ckpt", "2", "--test_no_video"])
print("HARD ALL DONE %.0fs" % (time.time() - t0), flush=True)
import shutil
for name in ("log_ngp.txt", "metrics.jsonl"):
    p = os.path.join(ws, name)
    if os.path.exists(p):
        shutil.copy(p, os.path.join(snap, f"hard_stage1_{name}"))
