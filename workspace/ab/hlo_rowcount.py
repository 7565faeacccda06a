import sys; sys.path.insert(0, "/root/repo")
"""Static attribution of the train step's random-access cost (CPU-side).

Traces the REAL train step at bench steady-state shapes (no compile, no
chip), walks the lowered StableHLO, and tallies the row volume of every
gather/scatter op.  On the measured backend (~0.11 G rows/s gather,
~0.095 G rows/s scatter-add, serial row loop), row volume ~ milliseconds —
so this predicts the step's random-access floor and names the op sites.

Usage: JAX_PLATFORMS=cpu python workspace/ab/hlo_rowcount.py [num_rays]
"""
import os
os.environ.setdefault("JAX_PLATFORMS", "cpu")

import re
import dataclasses
from collections import defaultdict

import numpy as np


def main():
    import jax
    from nerf2mesh_tpu.config import Config
    from nerf2mesh_tpu.data.provider import load_nerf_dataset
    from nerf2mesh_tpu.data.synthetic import generate_synthetic_dataset
    from nerf2mesh_tpu.utils.trainer import Trainer

    nr = int(sys.argv[1]) if len(sys.argv) > 1 else 32768

    root = "/tmp/bench_scene_hlo"
    if not os.path.exists(os.path.join(root, "transforms_train.json")):
        generate_synthetic_dataset(root, H=64, W=64, n_train=4, n_val=1,
                                   n_test=1)

    cfg = dataclasses.replace(
        Config(path=root), bound=1.0, scale=0.8, dt_gamma=0.0, iters=30000,
        num_rays=nr, num_points=2**18, max_steps=1024, grid_size=128,
        diffuse_step=1000, random_image_batch=True, background="random",
        mark_untrained=False, adaptive_num_rays=True,
        workspace="/tmp/ws_hlo").finalize()

    ds = load_nerf_dataset(cfg, "train")
    tr = Trainer(cfg)
    import jax.numpy as jnp
    images = jnp.asarray(ds.images)
    poses = jnp.asarray(ds.poses)
    intrinsics = jnp.asarray(ds.intrinsics)

    fn = tr.step_fn_for(nr)
    lowered = fn.lower(tr.state, images, poses, intrinsics, None,
                       tr.dynamics(512))
    txt = lowered.as_text()

    # stablehlo: gathers are single-line; scatters span a region, with the
    # functional type signature `}) : (tensor<src>, tensor<idx>, tensor<upd>)`
    # on the region-closing line.  lax.cond branches appear as `case`/`if`
    # regions — ops inside them are tallied separately (they may be the
    # rarely-taken exact-fallback branches, not steady-state cost).
    tally = defaultdict(lambda: [0, 0])
    lines = txt.splitlines()
    brace_depth = 0
    cond_stack = []          # brace depths at which a case/if region opened
    pend_scatter = None
    for line in lines:
        opened = line.count("{") - line.count("}")
        if "stablehlo.case" in line or "stablehlo.if" in line:
            cond_stack.append(brace_depth)
        brace_depth += opened
        while cond_stack and brace_depth <= cond_stack[-1]:
            cond_stack.pop()
        branch = bool(cond_stack)
        if pend_scatter is not None:
            m = re.search(r"\)\s*:\s*\(([^)]*)\)", line)
            if m:
                types = re.findall(r"tensor<([0-9]+(?:x[0-9]+)*)x[a-z]",
                                   m.group(1))
                if len(types) >= 2:
                    idx_dims = [int(d) for d in types[1].split("x")]
                    rows = int(np.prod(idx_dims[:-1])) if len(idx_dims) > 1 \
                        else int(idx_dims[0])
                    key = ("scatter" + ("[cond]" if pend_scatter else ""),
                           rows, 0)
                    tally[key][0] += 1
                    tally[key][1] += rows
                pend_scatter = None
            continue
        if '"stablehlo.scatter"' in line:
            pend_scatter = branch
            continue
        if "stablehlo.gather" in line:
            m = re.search(r"->\s*tensor<([0-9]+(?:x[0-9]+)*)x(?:[a-z])", line)
            im = re.search(r"tensor<([0-9]+(?:x[0-9]+)*)xi(?:32|64)>", line)
            if not (m and im):
                continue
            shape = [int(d) for d in m.group(1).split("x")]
            idx_dims = [int(d) for d in im.group(1).split("x")]
            rows = int(np.prod(idx_dims[:-1])) if len(idx_dims) > 1 \
                else int(idx_dims[0])
            width = int(np.prod(shape)) // max(rows, 1)
            key = ("gather" + ("[cond]" if branch else ""), rows, width)
            tally[key][0] += 1
            tally[key][1] += rows
    print(f"== step gather/scatter census at num_rays={nr}, "
          f"pool={cfg.num_points} (shapes from trace, no compile)")
    total_ms = 0.0
    rows_sum = {"gather": 0, "scatter": 0}
    for (kind, rows, width), (count, vol) in sorted(
            tally.items(), key=lambda kv: -kv[1][1]):
        base = kind.split("[")[0]
        rate = 0.11e9 if base == "gather" else 0.095e9
        ms = vol / rate * 1e3
        if "[cond]" not in kind:
            total_ms += ms
            rows_sum[base] += vol
        print(f"{kind:8s} rows={rows:>12,} width={width:<4d} x{count:<3d}"
              f" -> {vol:>14,} rows  ~{ms:7.1f} ms")
    print(f"TOTAL predicted random-access floor: {total_ms:.0f} ms "
          f"(gather {rows_sum['gather']:,} rows, "
          f"scatter {rows_sum['scatter']:,} rows)")


if __name__ == "__main__":
    main()
