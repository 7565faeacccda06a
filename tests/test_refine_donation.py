"""Regression: the donated stage-1 step must run after a refine-style
optimizer reset at step > 0.

`_reset_stage1_params` preserves the global schedule count with
`otu.tree_set(opt_state, count=...)`, which (without the fix) wrote the
SAME array object into every `count` leaf of the optax chain.
`_build_stage1_step` donates the opt_state, and XLA rejects donating one
buffer twice: `INVALID_ARGUMENT: Attempt to donate the same buffer twice
in Execute()`.  This broke MULTICHIP_r04 (one replica raised, seven hung
at the psum -> rendezvous abort rc 134), the round-4 stage-1 bench, and
any refine-enabled stage-1 run.  The pre-existing tests missed it because
they either checked tree_set semantics without donation
(test_refine_budget) or ran the donated step only at step 0
(test_parallel, test_stage1_padding)."""
import dataclasses

import jax
import jax.numpy as jnp
import numpy as np

from tests.test_stage1_padding import _mesh


def test_donated_stage1_step_after_refine_reset(tmp_path):
    from nerf2mesh_tpu.config import Config
    from nerf2mesh_tpu.data.provider import load_nerf_dataset
    from nerf2mesh_tpu.data.synthetic import generate_synthetic_dataset
    from nerf2mesh_tpu.utils.trainer import Trainer

    root = str(tmp_path / "scene")
    generate_synthetic_dataset(root, H=48, W=48, n_train=3, n_val=1, n_test=1)
    cfg = dataclasses.replace(
        Config(path=root, workspace=str(tmp_path / "ws")),
        bound=1.0, scale=0.8, dt_gamma=0.0, iters=3000, num_rays=256,
        num_points=4096, max_steps=32, grid_size=32, stage=1,
        s1_crop=32, refine=False).finalize()
    tr = Trainer(cfg)
    tr.stage1_mesh = _mesh(2)
    tr._s1_crop = 32
    # the refine regime: optimizer reset happens at a global step > 0, so
    # the schedule-count injection branch fires
    tr.state = tr.state._replace(step=jnp.asarray(2, jnp.int32))
    tr._reset_stage1_params()

    # every count leaf carries the injected step AND owns its buffer
    counts = [x for x in jax.tree_util.tree_leaves(tr.state.opt_state)
              if getattr(x, "dtype", None) == jnp.int32 and x.ndim == 0]
    assert counts and all(int(c) == 2 for c in counts), counts
    ids = [id(c) for c in counts]
    assert len(set(ids)) == len(ids), "count leaves alias one buffer"

    # the donated step itself must execute (this is what r4 shipped broken)
    ds = load_nerf_dataset(cfg, "train")
    out = tr.train_stage1(ds, None, max_steps=4)
    assert np.isfinite(float(out["loss"]))
