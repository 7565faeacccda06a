"""Benchmark: stage-0 training throughput (rays/sec) on one TPU chip.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.

Configuration mirrors the reference's nerf-synthetic defaults
(scripts/runall_syn.sh: bound 1, dt_gamma 0; main.py: num_rays 4096,
num_points 2^18, max_steps 1024, grid 128, update grid every 16 steps).
The scene is the procedurally generated sphere dataset (no datasets ship in
this environment); throughput is compute-bound and scene-agnostic at fixed
occupancy, and the density-grid update cadence is included (amortized), so
the number is comparable to the reference's steady-state training rate.

BASELINE_RAYS_PER_SEC is an estimate of the reference implementation on V100
(torch-ngp-style hash-grid NeRF, fp16, cuda raymarching): ~30k iters of
stage 0 in ~20-25 min at an adaptive average ~8-10k rays/step ==> ~2e5
rays/sec.  The reference repo publishes no number (BASELINE.md); the driver
north star is >=2x this.
"""

import json
import os
import sys
import time

BASELINE_RAYS_PER_SEC = 2.0e5

NUM_RAYS = 4096
WARMUP_STEPS = 256
BENCH_STEPS = 32


def main():
    sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
    import jax
    import jax.numpy as jnp
    import numpy as np

    from nerf2mesh_tpu.config import Config
    from nerf2mesh_tpu.data.provider import load_nerf_dataset
    from nerf2mesh_tpu.data.synthetic import generate_synthetic_dataset
    from nerf2mesh_tpu.utils.trainer import Trainer

    root = "/tmp/bench_scene"
    if not os.path.exists(os.path.join(root, "transforms_train.json")):
        generate_synthetic_dataset(root, H=256, W=256, n_train=24, n_val=2,
                                   n_test=2)

    import dataclasses
    cfg = dataclasses.replace(
        Config(path=root),
        bound=1.0, scale=0.8, dt_gamma=0.0, iters=30000,
        num_rays=NUM_RAYS, num_points=2 ** 18, max_steps=1024,
        grid_size=128, diffuse_step=1000, random_image_batch=True,
        background="random", mark_untrained=True, adaptive_num_rays=True,
        # default ON (matches Config): quality-validated on the hard proxy
        # (A/B: 28.29 dB stochastic vs 26.10 exact at equal steps) at ~2x
        # throughput; NERF2MESH_BENCH_STOCHASTIC=0 benches the exact path
        stochastic_fine=os.environ.get(
            "NERF2MESH_BENCH_STOCHASTIC", "1") == "1",
        workspace="/tmp/bench_ws",
    ).finalize()

    ds = load_nerf_dataset(cfg, "train")
    trainer = Trainer(cfg)
    trainer.mark_untrained(ds)

    images = jnp.asarray(ds.images)
    poses = jnp.asarray(ds.poses)
    intrinsics = jnp.asarray(ds.intrinsics)

    # warmup: compile; let occupancy sparsity, the adaptive ray count and
    # the encoder's per-level routing all settle (the reference measures
    # steady-state throughput at the 2^18 points/step adaptive target too,
    # main.py:67-69)
    # steps are dispatched in scan chunks of the grid-update cadence
    # (cfg.steps_per_dispatch): the relay's ~0.5 s per-dispatch overhead
    # otherwise dominates the 0.33 s step compute (PERF.md session-5)
    chunk = max(1, min(int(cfg.steps_per_dispatch),
                       cfg.update_extra_interval))
    state = trainer.state
    for step in range(0, WARMUP_STEPS, chunk):
        if step % cfg.update_extra_interval == 0:
            trainer.state = state
            trainer.update_grid(step)
            state = trainer.state
        nr = trainer._bucket(trainer.num_rays)
        fn = trainer.step_fn_for(nr, chunk)
        state, metrics = fn(state, images, poses, intrinsics, None,
                            trainer.dynamics(step))
        if (step + chunk) % cfg.update_extra_interval == 0:
            npts = int(metrics["num_points"])   # syncs; warmup only
            if npts > 0:
                trainer.num_rays = int(round(cfg.num_points / npts * nr))
            trainer._update_encode_routing(metrics)
    float(metrics["loss"])

    # measurement: routing/ray count frozen; fetch one scalar at the end
    # (block_until_ready does not reliably block through the axon relay)
    nr = trainer._bucket(trainer.num_rays)
    fn = trainer.step_fn_for(nr, chunk)
    total_rays = 0
    t0 = time.perf_counter()
    for step in range(WARMUP_STEPS, WARMUP_STEPS + BENCH_STEPS, chunk):
        if step % cfg.update_extra_interval == 0:
            trainer.state = state
            trainer.update_grid(step)
            state = trainer.state
        state, metrics = fn(state, images, poses, intrinsics, None,
                            trainer.dynamics(step))
        total_rays += nr * chunk
    float(metrics["loss"])
    dt = time.perf_counter() - t0

    # the step fn donates its state argument; trainer.state still points at
    # the donated (deleted) buffers from the last dispatch.  setup_stage1
    # copies trainer.state.params -> INVALID_ARGUMENT on real TPUs (donation
    # is a no-op on CPU, so only the chip crashed — round-3 Weak #2)
    trainer.state = state

    rays_per_sec = total_rays / dt

    # ---- stage-1 refine steps/sec (the driver metric's third component) ----
    # A procedural icosphere at capstone scale (~82k faces) stands in for the
    # exported stage-0 mesh: step cost depends on face/crop counts, not on
    # the trained weights, so this measures the real stage-1 training step
    # (rasterize fwd+bwd, offsets/laplacian losses, Adam) at steady state.
    s1_steps_per_sec = None
    try:
        s1_steps_per_sec = _bench_stage1(trainer, ds, images, poses,
                                         intrinsics, cfg)
    except Exception as e:  # keep the headline metric robust
        import traceback
        print(f"[WARN] stage1 bench failed: {e}", file=sys.stderr)
        traceback.print_exc(file=sys.stderr)

    out = {
        "metric": "stage0_train_rays_per_sec",
        "value": round(rays_per_sec, 1),
        "unit": "rays/s",
        "vs_baseline": round(rays_per_sec / BASELINE_RAYS_PER_SEC, 3),
    }
    if s1_steps_per_sec is not None:
        out["stage1_refine_steps_per_sec"] = round(s1_steps_per_sec, 2)
    print(json.dumps(out))


def _icosphere(subdiv: int):
    """Unit icosphere (vectorized subdivision); 20 * 4**subdiv faces."""
    import numpy as np
    t = (1.0 + 5 ** 0.5) / 2.0
    v = np.array([[-1, t, 0], [1, t, 0], [-1, -t, 0], [1, -t, 0],
                  [0, -1, t], [0, 1, t], [0, -1, -t], [0, 1, -t],
                  [t, 0, -1], [t, 0, 1], [-t, 0, -1], [-t, 0, 1]], np.float64)
    f = np.array([[0, 11, 5], [0, 5, 1], [0, 1, 7], [0, 7, 10], [0, 10, 11],
                  [1, 5, 9], [5, 11, 4], [11, 10, 2], [10, 7, 6], [7, 1, 8],
                  [3, 9, 4], [3, 4, 2], [3, 2, 6], [3, 6, 8], [3, 8, 9],
                  [4, 9, 5], [2, 4, 11], [6, 2, 10], [8, 6, 7], [9, 8, 1]],
                 np.int64)
    v /= np.linalg.norm(v, axis=1, keepdims=True)
    for _ in range(subdiv):
        e = np.concatenate([f[:, [0, 1]], f[:, [1, 2]], f[:, [2, 0]]])
        e = np.sort(e, axis=1)
        ue, inv = np.unique(e, axis=0, return_inverse=True)
        mid = v[ue[:, 0]] + v[ue[:, 1]]
        mid /= np.linalg.norm(mid, axis=1, keepdims=True)
        m = inv.reshape(3, -1).T + len(v)     # midpoint ids per face edge
        v = np.concatenate([v, mid])
        f = np.concatenate([
            np.stack([f[:, 0], m[:, 0], m[:, 2]], 1),
            np.stack([f[:, 1], m[:, 1], m[:, 0]], 1),
            np.stack([f[:, 2], m[:, 2], m[:, 1]], 1),
            m])
    return v.astype(np.float32), f.astype(np.int32)


def _bench_stage1(trainer, ds, images, poses, intrinsics, cfg,
                  warmup=4, steps=16):
    import time

    import jax.numpy as jnp
    import numpy as np

    from nerf2mesh_tpu.meshing.io import write_ply

    mdir = os.path.join(cfg.workspace, "mesh_stage0")
    os.makedirs(mdir, exist_ok=True)
    mv, mf = _icosphere(6)                    # 81,920 faces ~ capstone scale
    write_ply(os.path.join(mdir, "mesh_0.ply"), mv * 0.5, mf)
    trainer.setup_stage1(ds)
    fn = trainer._build_stage1_step()
    mvps = jnp.asarray(ds.mvps)

    state = trainer.state
    te, tc = trainer.tri_errors, trainer.tri_counts
    for s in range(warmup):
        state, te, tc, m = fn(state, te, tc, trainer.mesh_v, trainer.mesh_f,
                              trainer.mesh_edges, trainer.mesh_deg,
                              trainer.mesh_pairs, trainer.s1_counts, images,
                              poses, mvps, intrinsics, trainer.dynamics(s))
    float(m["loss"])
    t0 = time.perf_counter()
    for s in range(warmup, warmup + steps):
        state, te, tc, m = fn(state, te, tc, trainer.mesh_v, trainer.mesh_f,
                              trainer.mesh_edges, trainer.mesh_deg,
                              trainer.mesh_pairs, trainer.s1_counts, images,
                              poses, mvps, intrinsics, trainer.dynamics(s))
    float(m["loss"])
    return steps / (time.perf_counter() - t0)


if __name__ == "__main__":
    main()
