"""Reduced SDF (NeuS) chip recipe — wall-clock-bounded variant of
sdf_chip_run.py (VERDICT r4 #5).

Same pipeline (scratch double-sphere pretrain -> NeuS stage-0 -> export ->
chamfer-vs-analytic probe -> remesh-only stage-1), budget cut to fit the
round-5 continuation window: 1200 stage-0 iters, 400 stage-1 iters.
Artifacts snapshot incrementally so a mid-run kill still leaves evidence.
"""
import sys

sys.path.insert(0, "/root/repo")

import json
import os
import shutil
import time

import numpy as np

from nerf2mesh_tpu.data.synthetic import SphereScene, generate_synthetic_dataset
from nerf2mesh_tpu.main import main

root = "/root/repo/workspace/runs/sdf_scene"
ws = "/root/repo/workspace/runs/ws_sdf2"
snap = "/root/repo/workspace/validation/round5"
os.makedirs(snap, exist_ok=True)

if not os.path.exists(os.path.join(root, "transforms_train.json")):
    t = time.time()
    generate_synthetic_dataset(root, H=256, W=256, n_train=64, n_val=3,
                               n_test=4, ssaa=3)
    print("SDF GT generated %.0fs" % (time.time() - t), flush=True)

SCALE = 0.8
t0 = time.time()


def snapshot():
    for name in ("log_ngp.txt", "metrics.jsonl"):
        p = os.path.join(ws, name)
        if os.path.exists(p):
            shutil.copy(p, os.path.join(snap, f"sdf_chip2_{name}"))


main([root, "--workspace", ws, "--sdf", "--ckpt", "scratch",
      "--bound", "1", "--scale", str(SCALE), "--dt_gamma", "0",
      "--iters", "1200", "--num_rays", "1024", "--num_points", "65536",
      "--max_steps", "512",
      "--grid_size", "128", "--diffuse_step", "200",
      "--random_image_batch", "--mark_untrained", "--adaptive_num_rays",
      "--mesh_visibility_culling",
      "--mcubes_reso", "192", "--decimate_target", "100000",
      "--n_eval", "2", "--n_ckpt", "2", "--test_no_video"])
print("SDF STAGE0 DONE %.0fs" % (time.time() - t0), flush=True)
snapshot()

from nerf2mesh_tpu.meshing.io import read_ply  # noqa: E402

v, f = read_ply(os.path.join(ws, "mesh_stage0", "mesh_0.ply"))
scene = SphereScene()
d = np.abs(scene.sdf(np.asarray(v, np.float32) / SCALE) * SCALE)
stats = {
    "verts": int(len(v)), "faces": int(len(f)),
    "mean_abs_sdf": float(d.mean()),
    "p90_abs_sdf": float(np.percentile(d, 90)),
    "frac_within_0.01": float((d < 0.01).mean()),
    "frac_within_0.03": float((d < 0.03).mean()),
}
print("SDF chamfer probe:", json.dumps(stats), flush=True)
with open(os.path.join(snap, "sdf_chip.json"), "w") as fh:
    json.dump(stats, fh, indent=1)

main([root, "--workspace", ws, "--sdf",
      "--stage", "1", "--bound", "1", "--scale", str(SCALE),
      "--dt_gamma", "0", "--iters", "400", "--refine",
      "--texture_size", "1024",
      "--n_eval", "1", "--n_ckpt", "1", "--test_no_video"])
print("SDF ALL DONE %.0fs" % (time.time() - t0), flush=True)
snapshot()
