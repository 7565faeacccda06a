import sys; sys.path.insert(0, "/root/repo")
"""Locate big gather/scatter ops in the train step with FULLY RESOLVED
source locations (recursively chases #locNNN references to file:line)."""
import os
os.environ.setdefault("JAX_PLATFORMS", "cpu")
import dataclasses
import re

import numpy as np


def main():
    import jax
    import jax.numpy as jnp
    from nerf2mesh_tpu.config import Config
    from nerf2mesh_tpu.data.provider import load_nerf_dataset
    from nerf2mesh_tpu.data.synthetic import generate_synthetic_dataset
    from nerf2mesh_tpu.utils.trainer import Trainer

    nr = 32768
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
    images = jnp.asarray(ds.images)
    poses = jnp.asarray(ds.poses)
    intrinsics = jnp.asarray(ds.intrinsics)
    fn = tr.step_fn_for(nr)
    txt = fn.lower(tr.state, images, poses, intrinsics, None,
                   tr.dynamics(512)).as_text(debug_info=True)

    lines = txt.splitlines()
    locdefs = {}
    for line in lines:
        m = re.match(r"(#loc[0-9]+) = (.*)", line.strip())
        if m:
            locdefs[m.group(1)] = m.group(2)

    def leaves(locref, depth=0, seen=None):
        """Recursively resolve a #locN reference to its file:line leaves."""
        seen = seen or set()
        if locref in seen or depth > 12:
            return []
        seen.add(locref)
        body = locdefs.get(locref, locref)
        out = []
        for m in re.finditer(r'"([^"]+\.py)":([0-9]+)', body):
            out.append(f"{m.group(1).split('/')[-1]}:{m.group(2)}")
        for m in re.finditer(r"#loc[0-9]+", body):
            out.extend(leaves(m.group(0), depth + 1, seen))
        return out

    def emit(kind, rows, loc, func):
        refs = re.findall(r"#loc[0-9]+", loc) or [loc]
        leafset = []
        for r in refs:
            leafset.extend(leaves(r))
        named = re.findall(r'"([^"]*)"', locdefs.get(refs[0], loc))
        print(f"{kind} rows={rows:,}  in={func}")
        print(f"   names: {named[:4]}")
        print(f"   src: {leafset[:8]}\n")

    func = "?"
    pend = None
    for line in lines:
        fm = re.match(r"\s*func\.func.* @([A-Za-z0-9_.]+)", line)
        if fm:
            func = fm.group(1)
        if pend is not None:
            m = re.search(r"\)\s*:\s*\(([^)]*)\)", line)
            if m:
                types = re.findall(r"tensor<([0-9]+(?:x[0-9]+)*)x[a-z]",
                                   m.group(1))
                if len(types) >= 2:
                    idx_dims = [int(d) for d in types[1].split("x")]
                    rows = (int(np.prod(idx_dims[:-1]))
                            if len(idx_dims) > 1 else int(idx_dims[0]))
                    if rows >= 4_000_000:
                        loc = re.search(r"loc\((.*)\)", line)
                        emit("scatter", rows, loc.group(1) if loc else "?",
                             func)
                pend = None
            continue
        if '"stablehlo.scatter"' in line:
            pend = line.strip()
            continue
        if "stablehlo.gather" in line:
            im = re.search(r"tensor<([0-9]+(?:x[0-9]+)*)xi(?:32|64)>", line)
            if not im:
                continue
            idx_dims = [int(d) for d in im.group(1).split("x")]
            rows = (int(np.prod(idx_dims[:-1]))
                    if len(idx_dims) > 1 else int(idx_dims[0]))
            if rows >= 4_000_000:
                loc = re.search(r"loc\((.*)\)$", line.strip())
                emit("gather", rows, loc.group(1) if loc else "?", func)


if __name__ == "__main__":
    main()
