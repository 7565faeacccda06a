import sys; sys.path.insert(0, "/root/repo")
"""Stage-1 capstone rerun after the rasterizer/culling fixes (reuses the
stage-0 checkpoint in /tmp/ws_full; re-exports the coarse mesh, retrains
stage 1).  Compare against the pre-fix run: stage-0 31.36 dB, stage-1 23.15.
"""
import dataclasses
import time

import numpy as np

from nerf2mesh_tpu.config import Config
from nerf2mesh_tpu.data.provider import load_nerf_dataset
from nerf2mesh_tpu.utils.trainer import Trainer
from nerf2mesh_tpu.main import main

t0 = time.time()
cfg = dataclasses.replace(
    Config(path="/tmp/bench_scene"), bound=1.0, scale=0.8, dt_gamma=0.0,
    mesh_visibility_culling=True, mcubes_reso=256, decimate_target=100000,
    workspace="/tmp/ws_full").finalize()
tr = Trainer(cfg)
assert tr.load_checkpoint(stage=0)
ds = load_nerf_dataset(cfg, "train")
tr.save_mesh(resolution=256, decimate_target=100000, dataset=ds)
print("REEXPORT DONE %.0fs" % (time.time() - t0), flush=True)

# a FRESH stage-1 run: drop the previous run's stage-1 checkpoints (else
# --ckpt latest resumes the pre-fix training state) and the refined mesh
# (stage-1 prefers mesh_{cas}_updated.ply over the new export)
import glob
import os
for p in (glob.glob("/tmp/ws_full/checkpoints/ngp_stage1_*")
          + glob.glob("/tmp/ws_full/mesh_stage0/*_updated.ply")):
    os.remove(p)
    print("removed", p, flush=True)

main(["/tmp/bench_scene", "--workspace", "/tmp/ws_full",
      "--stage", "1", "--bound", "1", "--scale", "0.8", "--dt_gamma", "0",
      "--iters", "1000", "--refine", "--texture_size", "1024", "--ssaa", "1",
      "--n_eval", "2", "--n_ckpt", "2", "--test_no_video"])
print("S1 RERUN DONE %.0fs" % (time.time() - t0), flush=True)
