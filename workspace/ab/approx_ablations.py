import sys; sys.path.insert(0, "/root/repo")
"""Quality cost of the TPU-design approximations (VERDICT item 7), measured
on the HARD proxy scene at fixed step budget:

  base      : shipped defaults (slab-rotated grid refresh, spr=32, merged C=3)
  fullgrid  : full 128^3 grid refresh every update (reference cadence,
              renderer.py:1074-1149) vs rotating 1/8 slabs
  spr64     : samples_per_ray 64 (denser fixed-shape march)
  septables : separate sigma/color tables (reference architecture parity)

Each run: same seed/scene/steps; report val PSNR.  Results go into PERF.md.
"""
import dataclasses, json, os, time

import numpy as np

STEPS = int(os.environ.get("AB_STEPS", "1200"))


def run(tag, steps=STEPS, spr=32, separate=False, fullgrid=False,
        stochastic=None):
    import jax, jax.numpy as jnp
    from nerf2mesh_tpu.config import Config
    from nerf2mesh_tpu.data.provider import load_nerf_dataset
    from nerf2mesh_tpu.data.synthetic import HardScene, generate_synthetic_dataset
    from nerf2mesh_tpu.utils import trainer as trainer_mod
    from nerf2mesh_tpu.utils.trainer import Trainer

    root = "/tmp/hard_scene_ds"
    if not os.path.exists(os.path.join(root, "transforms_train.json")):
        generate_synthetic_dataset(root, scene=HardScene(), H=256, W=256,
                                   n_train=48, n_val=3, n_test=3)

    cfg = dataclasses.replace(
        Config(path=root), bound=1.0, scale=0.8, dt_gamma=0.0, iters=steps,
        num_rays=4096, num_points=2 ** 18, max_steps=1024, grid_size=128,
        samples_per_ray=spr, diffuse_step=300, random_image_batch=True,
        background="random", mark_untrained=True, adaptive_num_rays=True,
        workspace=f"/tmp/ab_{tag}", n_eval=1, n_ckpt=1,
    ).finalize()
    if stochastic is not None:
        cfg = dataclasses.replace(cfg, stochastic_fine=stochastic)
    ds = load_nerf_dataset(cfg, "train")
    vds = load_nerf_dataset(cfg, "val")
    tr = Trainer(cfg)
    if separate:
        tr.net_spec = dataclasses.replace(tr.net_spec, separate_tables=True)
        from nerf2mesh_tpu.models.network import init_network
        tr.state = tr.state._replace(
            params=init_network(jax.random.PRNGKey(42), tr.net_spec))
        tr.state = tr.state._replace(
            opt_state=tr.optimizer.init(tr.state.params),
            ema_params=jax.tree_util.tree_map(jnp.copy, tr.state.params))
    if fullgrid:
        orig = Trainer.update_grid

        def full_update(self, step):
            n = step // max(self.cfg.update_extra_interval, 1)
            # force the "first update" branch (all slabs) every time
            return orig(self, 0 if n >= 0 else step)
        tr.update_grid = full_update.__get__(tr)

    tr.mark_untrained(ds)
    t0 = time.time()
    tr.train(ds)
    dt = time.time() - t0
    m = tr.evaluate(vds)
    out = {"tag": tag, "steps": steps, "spr": spr, "separate": separate,
           "fullgrid": fullgrid, "train_s": round(dt, 1),
           **{k: round(float(v), 3) for k, v in m.items()
              if isinstance(v, (int, float, np.floating))}}
    print("ABRESULT " + json.dumps(out), flush=True)
    return out


if __name__ == "__main__":
    which = sys.argv[1:] or ["base", "exact", "fullgrid", "spr64",
                             "septables"]
    results = []
    for tag in which:
        if tag == "base":
            results.append(run("base"))
        elif tag == "exact":
            # price the stochastic_fine default (judge r3 Weak #7): same
            # budget, exact trilinear encode
            results.append(run("exact", stochastic=False))
        elif tag == "fullgrid":
            results.append(run("fullgrid", fullgrid=True))
        elif tag == "spr64":
            results.append(run("spr64", spr=64))
        elif tag == "septables":
            results.append(run("septables", separate=True))
    print(json.dumps(results, indent=1))
