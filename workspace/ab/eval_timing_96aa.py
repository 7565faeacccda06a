import sys; sys.path.insert(0, "/root/repo")
"""Time the fused one-dispatch eval renderer (render_frame_queue) on the
capstone-96aa stage-0 checkpoint.  Target (VERDICT item 5): <= 0.5 s per
256^2 frame; round-1 was 6.8 s, session-3 relay-loop path 1.73 s."""
import dataclasses
import time

from nerf2mesh_tpu.config import Config
from nerf2mesh_tpu.data.provider import load_nerf_dataset
from nerf2mesh_tpu.utils.trainer import Trainer

cfg = dataclasses.replace(
    Config(path="/root/repo/workspace/runs/scene96aa"), bound=1.0, scale=0.8, dt_gamma=0.0,
    grid_size=128, workspace="/root/repo/workspace/runs/ws96v11").finalize()
ds = load_nerf_dataset(cfg, "val")
tr = Trainer(cfg)
assert tr.load_checkpoint(stage=0)
intr = ds.intrinsics_for(0)

for fused in (True, False):
    tr.render_image(ds.poses[0], intr, 256, 256, fused=fused)  # compile
    t0 = time.perf_counter()
    K = 4
    for k in range(K):
        tr.render_image(ds.poses[k % len(ds.poses)], intr, 256, 256,
                        fused=fused)
    dt = (time.perf_counter() - t0) / K
    tag = "fused-queue" if fused else "relay-loop"
    print(f"EVAL_RENDER[{tag}]: {dt*1e3:.0f} ms per 256^2 frame "
          f"(round-1: 6800; session-3: 1730; target 500)", flush=True)
