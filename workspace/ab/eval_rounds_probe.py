import sys; sys.path.insert(0, "/root/repo")
"""Profile render_image on the capstone-96 checkpoint: per-round alive
counts + wall time, to size the fused 2-stage eval pipeline (VERDICT item
5: 1.73 s -> 0.5 s target needs fewer host round-trips)."""
import dataclasses, os, time
import numpy as np
import jax

from nerf2mesh_tpu.config import Config
from nerf2mesh_tpu.data.provider import load_nerf_dataset
from nerf2mesh_tpu.utils import trainer as trainer_mod
from nerf2mesh_tpu.utils.trainer import Trainer

ws = "/tmp/ws96"
cfg = dataclasses.replace(
    Config(path="/tmp/bench_scene96"), bound=1.0, scale=0.8, dt_gamma=0.0,
    grid_size=128, workspace=ws).finalize()
ds = load_nerf_dataset(cfg, "val")
tr = Trainer(cfg)
assert tr.load_checkpoint(stage=0)

pose = ds.poses[0]
intr = ds.intrinsics_for(0) if hasattr(ds, "intrinsics_for") else ds.intrinsics

# warm compile
out = tr.render_image(pose, intr, 256, 256)
print("compiled", flush=True)

# instrument the round loop by monkey-patching np.nonzero call sites is
# fragile; instead re-run and time whole calls at several seg sizes
for seg in (32, 64, 128):
    t0 = time.perf_counter()
    out = tr.render_image(pose, intr, 256, 256, seg_samples=seg)
    t1 = time.perf_counter()
    t0b = time.perf_counter()
    out = tr.render_image(pose, intr, 256, 256, seg_samples=seg)
    t1b = time.perf_counter()
    print(f"seg={seg}: first {t1-t0:.2f}s, warm {t1b-t0b:.2f}s", flush=True)

# alive counts per round at seg=32 (replicate the loop's control flow)
import jax.numpy as jnp
from nerf2mesh_tpu.data.rays import get_rays

H = W = 256
params = tr.state.ema_params
rspec = tr.render_spec
fx, fy, cx, cy = np.asarray(intr)
rays = get_rays(jnp.asarray(pose[None]), (fx, fy, cx, cy), H, W)
ro = np.asarray(rays["rays_o"]); rd = np.asarray(rays["rays_d"])

# reuse private jitted fns from the warm call
prep = tr._eval_prep
occ = tr.state.render.occ_grid
aabb = jnp.asarray(tr._aabb)
n = H * W
pr = []
for h in range(0, n, 8192):
    pr.append(np.asarray(prep(occ, jnp.asarray(ro[h:h+8192]),
                              jnp.asarray(rd[h:h+8192]), aabb)))
pr = np.concatenate(pr)
nears, fars, olen = pr[:, 0].copy(), pr[:, 1], pr[:, 2]
eval_fine = max(rspec.num_fine, 128)
dt_min = 2.0 * np.sqrt(3.0) / rspec.max_steps
spacing = np.maximum(olen / eval_fine, dt_min).astype(np.float32)
T = np.ones(n, np.float32); tcur = nears; alive = olen > 0
print("round 0 alive:", int(alive.sum()), "/", n, flush=True)
seg_fn = tr._eval_seg
rnd = 0
while alive.any() and rnd < 16:
    idx = np.nonzero(alive)[0]
    m = idx.size
    outs = []
    for h in range(0, m, 8192):
        sl = idx[h:h+8192]
        b = 8192
        pad = b - sl.size
        roi = np.pad(ro[sl], ((0, pad), (0, 0)))
        rdi = np.pad(rd[sl], ((0, pad), (0, 0)), constant_values=1.0)
        o = seg_fn(params, occ, jnp.asarray(roi), jnp.asarray(rdi),
                   jnp.asarray(np.pad(tcur[sl], (0, pad))),
                   jnp.asarray(np.pad(fars[sl], (0, pad))),
                   jnp.asarray(np.pad(spacing[sl], (0, pad))))
        outs.append(np.asarray(o)[: sl.size])
    seg = np.concatenate(outs)
    T[idx] *= 1.0 - seg[:, 4]
    tcur[idx] = seg[:, 5]
    alive[idx] = (T[idx] > rspec.T_thresh) & (tcur[idx] <= fars[idx])
    rnd += 1
    print(f"after round {rnd}: alive {int(alive.sum())}", flush=True)
