"""CLI entry point (parity target: reference main.py:10-268).

Usage:  python -m nerf2mesh_tpu.main <data_path> [-O] [--sdf] [--stage 0|1] ...
Flag surface matches the reference (see config.py).
"""

from __future__ import annotations

import os
import sys

import numpy as np


def main(argv=None):
    from .config import parse_args

    cfg = parse_args(argv)

    import jax

    from .data.provider import load_nerf_dataset
    from .utils.metrics import LPIPSMeter, PSNRMeter, SSIMMeter
    from .utils.trainer import Trainer
    from .parallel.sharding import make_mesh

    np.random.seed(cfg.seed)

    # dataset selection by format (reference main.py:173-178)
    if cfg.data_format == "colmap":
        from .data.colmap import load_colmap_dataset as load_dataset
    elif cfg.data_format == "dtu":
        from .data.dtu import load_dtu_dataset as load_dataset
    else:
        load_dataset = load_nerf_dataset

    mesh = None
    if len(jax.devices()) > 1:
        mesh = make_mesh(cfg.mesh_shape, cfg.mesh_axes)

    trainer = Trainer(cfg, mesh=mesh)

    train_ds = None
    if cfg.stage == 1:
        # stage-1 state (refined mesh + vertices_offsets param) must exist
        # BEFORE checkpoint restore, or the restore drops the saved offsets
        # as unexpected keys (non-strict load) and resume silently loses
        # them (reference loads the mesh in the model ctor, renderer.py:128,
        # so its load_checkpoint at utils.py:587-589 sees matching keys)
        train_ds = load_dataset(cfg, split=cfg.train_split)
        trainer.setup_stage1(train_ds)

    if cfg.ckpt == "latest":
        loaded = trainer.load_checkpoint()
        if not loaded and cfg.stage == 1:
            trainer.load_checkpoint(stage=0)
    elif cfg.ckpt == "scratch":
        if cfg.sdf and cfg.stage == 0:
            trainer.sdf_pretrain()
    elif cfg.ckpt:
        trainer.load_checkpoint(cfg.ckpt)

    if cfg.test:
        test_ds = load_dataset(cfg, split="test")
        if test_ds.has_gt:
            trainer.metrics = [PSNRMeter(), SSIMMeter(), LPIPSMeter()]
            trainer.evaluate(test_ds, name="test", write_images=True)
        if not cfg.test_no_video:
            trainer.test_video(test_ds)
        if not cfg.test_no_mesh and cfg.stage == 0:
            train_ds = load_dataset(cfg, split=cfg.train_split) \
                if cfg.mesh_visibility_culling else None
            trainer.save_mesh(resolution=cfg.mcubes_reso,
                              decimate_target=cfg.decimate_target,
                              dataset=train_ds)
        return

    if train_ds is None:
        train_ds = load_dataset(cfg, split=cfg.train_split)
    valid_ds = load_dataset(cfg, split="val")

    if cfg.vis_pose:
        # headless analog of the reference's interactive visualize_poses
        # (provider.py:244): dump frusta + bound box (+ sparse points) to
        # workspace/poses.ply (+ poses.png)
        from .utils.vis_pose import write_pose_vis
        path = write_pose_vis(
            trainer.workspace, train_ds.poses, cfg.bound,
            points=getattr(train_ds, "pts3d", None))
        print(f"[INFO] --vis_pose wrote {path}")

    if cfg.data_format == "colmap" and hasattr(train_ds, "pts_aabb"):
        trainer.update_aabb(train_ds.pts_aabb)

    trainer.metrics = [PSNRMeter()]
    if cfg.stage == 1:
        # setup_stage1 already ran (before checkpoint restore, above);
        # running it again would re-zero the restored vertices_offsets
        trainer.train_stage1(train_ds, valid_ds)
    else:
        trainer.train(train_ds, valid_ds)

    # final eval on val + test (reference main.py:253-263)
    trainer.metrics = [PSNRMeter(), SSIMMeter(), LPIPSMeter()]
    trainer.evaluate(valid_ds, name="val_final", write_images=True)
    test_ds = load_dataset(cfg, split="test")
    if test_ds.has_gt:
        trainer.evaluate(test_ds, name="test", write_images=True)
    if not cfg.test_no_video:
        trainer.test_video(test_ds)

    if cfg.stage == 0 and cfg.sharpen_steps > 0 and not cfg.sdf:
        # mesh-preparation sharpening AFTER the quality evals (they report
        # the NeRF's volumetric numbers) and BEFORE the export the stage-1
        # handoff consumes — see Config.sharpen_steps
        print(f"[INFO] sharpen phase: +{cfg.sharpen_steps} steps @ "
              f"entropy {cfg.sharpen_entropy}")
        trainer.train(train_ds, None,
                      max_steps=cfg.iters + cfg.sharpen_steps)
        trainer.save_checkpoint()

    if cfg.stage == 1:
        trainer.export_stage1(resolution=cfg.texture_size)
    elif not cfg.test_no_mesh:
        trainer.save_mesh(resolution=cfg.mcubes_reso,
                          decimate_target=cfg.decimate_target,
                          dataset=train_ds if cfg.mesh_visibility_culling else None)


if __name__ == "__main__":
    main()
