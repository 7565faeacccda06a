import sys; sys.path.insert(0, "/root/repo")
"""Sequential chip measurements for round 2 (run when the TPU is free):
  1. bench.py at defaults (the driver's headline number)
  2. bench with --stochastic_fine (train-only 1-corner fine levels)
  3. eval-render timing on the capstone checkpoint (VERDICT item 5)
Prints tagged lines; full output to the log.
"""
import json
import os
import subprocess
import time

REPO = "/root/repo"


def run_bench(env_extra, tag):
    env = dict(os.environ, **env_extra)
    p = subprocess.run([sys.executable, os.path.join(REPO, "bench.py")],
                       capture_output=True, text=True, env=env, timeout=3600)
    line = [l for l in p.stdout.splitlines() if l.startswith("{")]
    print(f"BENCH[{tag}]: {line[-1] if line else p.stderr[-500:]}", flush=True)


def eval_timing():
    import jax
    import numpy as np
    from nerf2mesh_tpu.config import Config
    from nerf2mesh_tpu.data.provider import load_nerf_dataset
    from nerf2mesh_tpu.utils.trainer import Trainer
    import dataclasses
    cfg = dataclasses.replace(
        Config(path="/tmp/bench_scene"), bound=1.0, scale=0.8, dt_gamma=0.0,
        grid_size=128, workspace="/tmp/ws_full").finalize()
    ds = load_nerf_dataset(cfg, "val")
    tr = Trainer(cfg)
    assert tr.load_checkpoint(stage=0)
    pose = ds.poses[0]
    intr = ds.intrinsics_for(0)
    # warm compile
    out = tr.render_image(pose, intr, 256, 256)
    t0 = time.perf_counter()
    K = 4
    for k in range(K):
        out = tr.render_image(ds.poses[k % len(ds.poses)], intr, 256, 256)
    dt = (time.perf_counter() - t0) / K
    print(f"EVAL_RENDER: {dt*1e3:.0f} ms per 256^2 frame "
          f"(round-1: 6800 ms; target 500)", flush=True)


if __name__ == "__main__":
    which = sys.argv[1:] or ["bench", "bench_sto", "eval"]
    if "bench" in which:
        run_bench({}, "default")
    if "bench_sto" in which:
        run_bench({"NERF2MESH_BENCH_STOCHASTIC": "1"}, "stochastic_fine")
    if "eval" in which:
        eval_timing()
