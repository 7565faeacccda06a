import sys; sys.path.insert(0, "/root/repo")
"""A/B: grid_layout ref vs block512 — does block-granular hashing cost PSNR?"""
import dataclasses, json, os, sys, time
import numpy as np

def run(layout, steps=600):
    import jax, jax.numpy as jnp
    from nerf2mesh_tpu.config import Config
    from nerf2mesh_tpu.data.provider import load_nerf_dataset
    from nerf2mesh_tpu.data.synthetic import generate_synthetic_dataset
    from nerf2mesh_tpu.utils.trainer import Trainer

    root = "/tmp/bench_scene"
    if not os.path.exists(os.path.join(root, "transforms_train.json")):
        generate_synthetic_dataset(root, H=256, W=256, n_train=24, n_val=2, n_test=2)

    cfg = dataclasses.replace(
        Config(path=root), bound=1.0, scale=0.8, dt_gamma=0.0, iters=steps,
        num_rays=4096, num_points=2**18, max_steps=1024, grid_size=128,
        diffuse_step=200, random_image_batch=True, background="random",
        mark_untrained=True, workspace=f"/tmp/ab_{layout}",
    ).finalize()
    ds = load_nerf_dataset(cfg, "train")
    vds = load_nerf_dataset(cfg, "val")
    tr = Trainer(cfg)
    tr.net_spec = dataclasses.replace(tr.net_spec, grid_layout=layout)
    from nerf2mesh_tpu.models.network import init_network
    tr.state = tr.state._replace(params=init_network(jax.random.PRNGKey(42), tr.net_spec))
    tr.state = tr.state._replace(opt_state=tr.optimizer.init(tr.state.params),
                                 ema_params=jax.tree_util.tree_map(jnp.copy, tr.state.params))
    tr.mark_untrained(ds)
    images = jnp.asarray(ds.images); poses = jnp.asarray(ds.poses)
    intr = jnp.asarray(ds.intrinsics)
    fn = tr.step_fn_for(cfg.num_rays)
    t0 = time.time()
    for step in range(steps):
        if step % cfg.update_extra_interval == 0:
            tr.update_grid(step)
        tr.state, m = fn(tr.state, images, poses, intr, None, tr.dynamics(step))
        if (step+1) % 200 == 0:
            print(f"[{layout} {step+1}] loss={float(m['loss']):.5f} "
                  f"train_psnr={float(m['psnr']):.2f} {time.time()-t0:.0f}s", flush=True)
    res = tr.evaluate(vds, name=f"ab_{layout}", max_frames=2)
    print(json.dumps({"layout": layout, **{k: float(v) for k, v in res.items()}}))
    return res

if __name__ == "__main__":
    run(sys.argv[1], int(sys.argv[2]) if len(sys.argv) > 2 else 600)
