"""Training runtime (parity target: reference nerf/utils.py Trainer, 467-1473).

TPU-native design points:
  * ONE jitted train step per ray-batch bucket: batch sampling (random image +
    pixel indices), ray generation, gt gather, marching, field eval,
    compositing, all losses, grads, optax update and EMA — all on device with
    static shapes and donated state.  No host<->device traffic in the hot loop.
  * bf16 compute replaces fp16 autocast + GradScaler (no scaler needed).
  * adaptive_num_rays quantizes to power-of-two buckets so the step stays
    compiled (the reference mutates opt.num_rays every step, utils.py:796-797;
    we re-bucket on the density-grid cadence instead).
  * data parallelism: with a multi-device mesh the ray batch is sharded via
    shard_map; gradients psum over the "data" axis (SURVEY.md §2.3).
"""

from __future__ import annotations

import dataclasses
import json
import os
import pickle
import time
from dataclasses import dataclass
from typing import Any, Dict, List, NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
import optax
from jax.sharding import Mesh, PartitionSpec as P

from ..config import Config
from ..data.provider import Dataset
from ..data.rays import get_rays
from ..models.network import (
    NetworkSpec, init_network, rgb, sdf_pretrain_loss,
)
from ..models.renderer import (
    RenderSpec, RenderState, init_render_state, mark_untrained_grid,
    render_train, update_density_grid,
)
from ..ops.hashgrid import hashgrid_tv_loss
from .metrics import Meter, PSNRMeter


class TrainState(NamedTuple):
    params: Any
    opt_state: Any
    ema_params: Any
    ema_count: jax.Array
    render: RenderState
    step: jax.Array
    key: jax.Array


def lr_schedule(cfg: Config):
    """Warmup 500 steps then exp decay to 0.1x (reference main.py:239)."""
    def fn(it):
        it = jnp.asarray(it, jnp.float32)
        warm = 0.01 + 0.99 * (it / 500.0)
        decay = 0.1 ** ((it - 500.0) / max(cfg.iters - 500.0, 1.0))
        return cfg.lr * jnp.where(it <= 500.0, warm, decay)
    return fn


def make_optimizer(cfg: Config, vert_horizon: Optional[int] = None):
    """Adam(eps=1e-15) with 0.1x lr for individual codes and SDF variance,
    and lr_vert for stage-1 vertex offsets (reference main.py:221,
    renderer.py:173-180, network.py:206).

    vert_horizon overrides the vertex-lr decay horizon (defaults to
    cfg.iters); train_stage1 passes its actual step budget so short runs
    (tests, probes) decay over the right span (ADVICE r3 #3)."""
    def label_fn(params):
        out = {}
        for k in params:
            if k in ("individual_codes", "variance"):
                out[k] = "slow"
            elif k == "vertices_offsets":
                out[k] = "vert"
            else:
                out[k] = "base"
        return out
    sched = lr_schedule(cfg)
    base = optax.adam(learning_rate=sched, eps=1e-15)
    slow = optax.adam(learning_rate=lambda it: sched(it) * 0.1, eps=1e-15)

    def vert_sched(it):
        # Exponential decay from s1_vert_boost*lr_vert down to lr_vert (no
        # warmup).  Adam moves offsets ~lr per consistent step, so the total
        # silhouette movement budget is ~integral(lr) over the run; the
        # reference amortizes lr_vert=1e-4 over 30k iters (main.py:221,243),
        # and a flat 1e-4 over our 300-1500-iter schedules leaves the
        # marching-cubes rim dilation (~1-2 voxels) unreachable (round-3
        # s1_cpu_debug: rim coverage froze at 0.77 vs GT 0.52; 30x lr closed
        # it and gained +4-6 dB full-frame).
        it = jnp.asarray(it, jnp.float32)
        horizon = float(vert_horizon if vert_horizon else cfg.iters)
        frac = jnp.clip(it / max(horizon, 1.0), 0.0, 1.0)
        boost = max(float(cfg.s1_vert_boost), 1.0)
        return cfg.lr_vert * boost ** (1.0 - frac)

    vert = optax.adam(learning_rate=vert_sched, eps=1e-15)
    return optax.multi_transform(
        {"base": base, "slow": slow, "vert": vert}, label_fn)


class StepDynamics(NamedTuple):
    """Per-step traced scalars (the reference mutates these on `opt`)."""
    full_shading: jax.Array       # bool: past diffuse warmup
    max_level: jax.Array          # int32: progressive level
    cos_anneal_ratio: jax.Array   # f32 (sdf)
    normal_epsilon: jax.Array     # f32 (sdf)
    lambda_depth_ramp: jax.Array  # f32 in [0,1]
    # traced weight-entropy coefficient: cfg.lambda_entropy during the main
    # run, stepped up to cfg.sharpen_entropy in the post-eval SHARPEN phase
    # (round-5: the converged field's ~40-cell soft ramp made every
    # surface-point shading read 24 dB; 2x600 sharpen steps took the
    # point-sample to 33.9 with volumetric interior quality intact).
    # Traced so the phase reuses the compiled train step.
    lambda_entropy: jax.Array     # f32




def make_stage1_crop_loss(cfg: Config, nspec, rspec):
    """Factory for the stage-1 per-crop loss — the shard body under crop
    data parallelism (each device draws its own image + random crop, the
    stage-1 analog of sharding the ray batch, SURVEY §2.3).  Module-level so
    tests can emulate shards one-by-one and check the collective math
    (tests/test_parallel.py)."""
    from ..models.stage1 import (
        edge_length_loss, laplacian_loss, normal_consistency_loss,
        offsets_loss, render_stage1_crop)
    from ..data.rays import pixel_dirs_cam
    from .losses import perceptual_loss

    ss = max(int(cfg.ssaa), 1)
    Cp = rspec.crop
    Cs = Cp * ss  # supersampled crop side (renderer.py:825-833)

    def crop_loss(params, kc, mesh_v, mesh_f, mesh_edges, mesh_deg,
                  mesh_pairs, counts, images_u8, poses, mvps, intrinsics):
        """Loss of ONE random crop render (the shard body under data
        parallelism: each device draws its own image + crop — the
        stage-1 analog of sharding the ray batch, SURVEY §2.3)."""
        v_real, f_real, e_real, p_real, v_inner = (
            counts[0], counts[1], counts[2], counts[3], counts[4])
        k_img, k_crop, k_bg = jax.random.split(kc, 3)
        B, H, W, C = images_u8.shape
        img_idx = jax.random.randint(k_img, (), 0, B)
        cy0 = jax.random.randint(k_crop, (), 0, max(H - Cp, 1))
        cx0 = jax.random.randint(k_crop, (), 0, max(W - Cp, 1))
        crop_origin = jnp.stack([cy0, cx0])

        gt_raw = jax.lax.dynamic_slice(
            images_u8, (img_idx, cy0, cx0, 0), (1, Cp, Cp, C)
        )[0].astype(jnp.float32) / 255.0

        # bg at supersampled resolution; GT composites against its pooled
        # version so render-downsample and GT agree
        if cfg.background == "white":
            bg = jnp.ones((Cs, Cs, 3))
            bg_lo = jnp.ones((Cp, Cp, 3))
        else:
            bg = jax.random.uniform(k_bg, (Cs, Cs, 3))
            bg_lo = bg.reshape(Cp, ss, Cp, ss, 3).mean(axis=(1, 3))

        if C == 4:
            gt_mask = gt_raw[..., 3:]
            gt_rgb = gt_raw[..., :3] * gt_mask + bg_lo * (1 - gt_mask)
            gt_white = gt_raw[..., :3] * gt_mask + (1 - gt_mask)
        else:
            gt_mask = None
            gt_rgb = gt_raw
            gt_white = gt_raw

        # per-pixel view directions at supersampled centers (full-res
        # pixel units: subpixel centers (k+0.5)/ss within each GT pixel)
        sub = (jnp.arange(Cs, dtype=jnp.float32) + 0.5) / ss
        jj = cy0.astype(jnp.float32) + sub[:, None]
        ii = cx0.astype(jnp.float32) + sub[None, :]
        jj = jnp.broadcast_to(jj, (Cs, Cs))
        ii = jnp.broadcast_to(ii, (Cs, Cs))
        # colmap-format datasets carry per-image intrinsics [B,4]
        # (colmap_provider.py per-view calibration); blender shares [4]
        intr = intrinsics[img_idx] if intrinsics.ndim == 2 else intrinsics
        dcam = pixel_dirs_cam(
            ii.reshape(-1), jj.reshape(-1),
            (intr[0], intr[1], intr[2], intr[3]))
        pose = poses[img_idx]
        dirs = (dcam @ pose[:3, :3].T).reshape(Cs, Cs, 3)
        mvp = mvps[img_idx]

        ind_code = None
        if cfg.ind_dim > 0:
            ind_code = params["individual_codes"][img_idx][None]

        out = render_stage1_crop(
            params, params["vertices_offsets"], mesh_v,
            mesh_f, mvp, crop_origin, dirs, bg, nspec, rspec,
            H, W,
            shading="full",
            ind_code=ind_code, contracted=cfg.contract,
            enable_offset_nerf_grad=cfg.enable_offset_nerf_grad,
            pos_gradient_boost=cfg.pos_gradient_boost,
            ssaa=ss, alpha_mode=cfg.s1_alpha, f_valid=f_real,
            shell_k=cfg.s1_shell, shell_h=cfg.s1_shell_h)

        loss_pix = cfg.lambda_rgb * jnp.mean(
            (out["image"] - gt_rgb) ** 2, axis=-1)
        if gt_mask is not None and cfg.lambda_mask > 0:
            loss_pix = loss_pix + cfg.lambda_mask * (
                (out["weights_sum"] - gt_mask[..., 0]) ** 2)
        loss = jnp.mean(loss_pix)

        verts = mesh_v + params["vertices_offsets"]
        if cfg.lambda_lap > 0:
            loss += cfg.lambda_lap * laplacian_loss(
                verts, mesh_edges, mesh_deg, v_real, e_real)
        if cfg.lambda_normal > 0:
            loss += cfg.lambda_normal * normal_consistency_loss(
                verts, mesh_f, mesh_pairs, p_real)
        if cfg.lambda_edgelen > 0:
            loss += cfg.lambda_edgelen * edge_length_loss(
                verts, mesh_edges, e_real)
        if cfg.lambda_offsets > 0:
            loss += cfg.lambda_offsets * offsets_loss(
                params["vertices_offsets"], v_inner, cfg.bound,
                v_real)
        if cfg.lambda_lpips > 0:
            # weight-free perceptual analog of the reference's
            # lpips-vgg crop loss (utils.py:1044-1049)
            loss += cfg.lambda_lpips * perceptual_loss(
                out["image"], gt_rgb)

        metrics = {
            "loss": loss,
            "psnr": -10.0 * jnp.log10(jnp.maximum(
                jnp.mean((out["image"] - gt_rgb) ** 2), 1e-12)),
            # the eval-protocol metric (white-composited both sides):
            # the random-bg psnr above reads ~3 dB high on identical
            # geometry because random bg lowers fg/bg contrast at the
            # rim (round-3 Weak #3) — quality decisions use THIS one
            "psnr_white": -10.0 * jnp.log10(jnp.maximum(
                jnp.mean((out["image_white"] - gt_white) ** 2),
                1e-12)),
            # triangles dropped past the raster compaction budget —
            # nonzero means the render (and its gradients) had holes
            "overflow": out["overflow"],
            # live fragments / overlapping tris: budget-occupancy telemetry
            "n_live": out["n_live"],
            "n_overlap": out["n_overlap"],
        }
        return loss, (metrics, out["trig_id"], loss_pix)

    return crop_loss


class Trainer:
    def __init__(self, cfg: Config, workspace: Optional[str] = None,
                 mesh: Optional[Mesh] = None):
        self.cfg = cfg
        self.workspace = workspace or cfg.workspace
        os.makedirs(self.workspace, exist_ok=True)
        os.makedirs(os.path.join(self.workspace, "checkpoints"), exist_ok=True)
        os.makedirs(os.path.join(self.workspace, "validation"), exist_ok=True)

        self.mesh = mesh
        self.n_shards = 1 if mesh is None else int(np.prod(list(mesh.shape.values())))

        self.net_spec = NetworkSpec(
            bound=cfg.grid_bound, sdf=cfg.sdf, ind_dim=cfg.ind_dim,
            ind_num=cfg.ind_num, fp16=cfg.fp16,
            num_levels=cfg.num_levels,
            log2_hashmap_size=cfg.log2_hashmap_size,
            grid_layout=cfg.grid_layout,
        )
        self.render_spec = RenderSpec(
            bound=cfg.bound, contract=cfg.contract, grid_size=cfg.grid_size,
            min_near=cfg.min_near, density_thresh=cfg.density_thresh,
            max_steps=cfg.max_steps, num_coarse=cfg.coarse_per_ray,
            num_fine=cfg.samples_per_ray,
            dt_gamma=cfg.dt_gamma, sdf=cfg.sdf,
        )

        key = jax.random.PRNGKey(cfg.seed)
        key, pkey = jax.random.split(key)
        params = init_network(pkey, self.net_spec)
        self.optimizer = make_optimizer(cfg)
        self.state = TrainState(
            params=params,
            opt_state=self.optimizer.init(params),
            # distinct buffers: params and ema are both donated in the step
            ema_params=jax.tree_util.tree_map(jnp.copy, params),
            ema_count=jnp.zeros((), jnp.int32),
            render=init_render_state(self.render_spec),
            step=jnp.zeros((), jnp.int32),
            key=key,
        )
        self.num_rays = cfg.num_rays
        # splat-encoder per-level routing: start fine levels (no early-training
        # window locality, see PERF.md) on the gather path; the residual-rate
        # probe moves levels back to the kernel as occupancy converges
        gspec = self.net_spec.density_grid_spec
        default_gather = tuple(
            l for l in range(gspec.num_levels)
            if gspec.resolutions[l] > 128)
        self.net_spec = dataclasses.replace(
            self.net_spec, encode_gather_levels=default_gather,
            encode_winsort_levels=(default_gather if cfg.winsort_fine
                                   else ()))
        # valid-sample pool: field evaluation costs O(pool) not O(rays*K)
        # (render_train pool_size; ~1.25x the adaptive point target, rounded
        # to tiles; None disables pooling)
        self.pool_size = (int(-(-cfg.num_points // 128) * 128)
                          if cfg.pool_points else None)
        self.metrics: List[Meter] = [PSNRMeter()]
        self._step_cache: Dict[int, Any] = {}
        self._aabb = np.array([-cfg.bound] * 3 + [cfg.bound] * 3, np.float32)
        self.stats: Dict[str, Any] = {"results": [], "best": None}
        self.log_path = os.path.join(self.workspace, f"log_ngp.txt")

    # ------------------------------------------------------------------ utils
    def log(self, msg: str):
        print(msg, flush=True)
        with open(self.log_path, "a") as f:
            f.write(msg + "\n")

    def update_aabb(self, aabb: np.ndarray):
        b = self.cfg.bound
        self._aabb = np.clip(np.asarray(aabb, np.float32), -b, b)
        self.log(f"[INFO] update_aabb: {self._aabb.tolist()}")

    # -------------------------------------------------------------- step fns
    def dynamics(self, step: int) -> StepDynamics:
        cfg = self.cfg
        half = max(0.5 * cfg.iters, 1.0)
        # stage 1 inherits a FULLY-trained field: the reference's stage-1
        # global_step continues from the stage-0 checkpoint (~30k), so its
        # `step < diffuse_step` warmup never re-fires (utils.py:654).  Our
        # stage-1 restarts step at 0 — without this gate it trained
        # DIFFUSE-ONLY for its first 1000 steps and the full-shading flip
        # mid-run spiked the loss 3x (v8 capstone step 1050)
        full = ((cfg.stage > 0 or step >= cfg.diffuse_step)
                and not cfg.diffuse_only)
        if cfg.progressive_level:
            ml = 4 + int(12 * min(1.0, step / half))
        else:
            ml = 16
        if cfg.sharpen_steps > 0 and step >= cfg.iters:
            lam_e = (cfg.sharpen_entropy if step >= cfg.iters
                     + cfg.sharpen_steps // 2 else 0.1 * cfg.sharpen_entropy)
        else:
            lam_e = cfg.lambda_entropy
        return StepDynamics(
            full_shading=jnp.asarray(full),
            max_level=jnp.asarray(ml, jnp.int32),
            cos_anneal_ratio=jnp.asarray(min(1.0, step / half), jnp.float32),
            normal_epsilon=jnp.asarray(1e-1 * (1 - min(0.999, step / half)), jnp.float32),
            lambda_depth_ramp=jnp.asarray(min(1.0, step / 1000.0), jnp.float32),
            lambda_entropy=jnp.asarray(lam_e, jnp.float32),
        )

    def _dynamics_traced(self, step: jax.Array) -> StepDynamics:
        """dynamics() on a TRACED step scalar — used inside multi-step scan
        dispatches where the step index advances on-device (same formulas)."""
        cfg = self.cfg
        half = jnp.float32(max(0.5 * cfg.iters, 1.0))
        s = step.astype(jnp.float32)
        ramp = jnp.minimum(1.0, s / half)
        if cfg.progressive_level:
            ml = 4 + (12.0 * ramp).astype(jnp.int32)
        else:
            ml = jnp.int32(16)
        if cfg.sharpen_steps > 0:
            lam_e = jnp.where(
                step >= cfg.iters,
                jnp.where(step >= cfg.iters + cfg.sharpen_steps // 2,
                          cfg.sharpen_entropy, 0.1 * cfg.sharpen_entropy),
                cfg.lambda_entropy).astype(jnp.float32)
        else:
            lam_e = jnp.float32(cfg.lambda_entropy)
        return StepDynamics(
            full_shading=jnp.logical_and(step >= cfg.diffuse_step,
                                         not cfg.diffuse_only),
            max_level=ml,
            cos_anneal_ratio=ramp,
            normal_epsilon=1e-1 * (1.0 - jnp.minimum(0.999, s / half)),
            lambda_depth_ramp=jnp.minimum(1.0, s / 1000.0),
            lambda_entropy=lam_e,
        )

    def _loss_and_metrics(self, params, render, key, images_u8, poses,
                          intrinsics, cam_near_far, dyn: StepDynamics,
                          num_rays: int, depth_data=None):
        """Pure per-shard loss (images replicated, rays sampled per shard).

        depth_data: optional dict with either
          dense [B, H, W] calibrated depth maps, or
          sparse (coords [B, R] flat pixel ids, depth [B, R], weight [B, R],
                  valid [B, R]) padded per image (colmap supervision,
          colmap_provider.py:505-522).
        """
        cfg, rspec, nspec = self.cfg, self.render_spec, self.net_spec
        if cfg.stochastic_fine and not cfg.sdf:
            # train step only — eval/grid/export paths keep exact trilinear.
            # NOT in SDF mode: NeuS normals are 6-point finite differences of
            # the raw field (network.py finite_difference_normal, reference
            # network.py:111-156); one-corner stochastic encoding makes those
            # 6 queries mutually inconsistent and wrecks the eikonal/normal
            # signal (round-2 regression: tests/test_sdf_e2e.py).
            nspec = dataclasses.replace(nspec, encode_stochastic=True)
        B, H, W, C = images_u8.shape
        k_img, k_pix, k_bg, k_march, k_sd = jax.random.split(key, 5)

        img_idx = jax.random.randint(k_img, (num_rays,), 0, B)
        if not cfg.random_image_batch:
            img_idx = jnp.broadcast_to(img_idx[:1], (num_rays,))
        if cfg.patch_size > 1:
            # patch-aligned sampling within one image (utils.py:254-271):
            # random top-left corners, expanded to ps x ps pixel blocks.
            ps = cfg.patch_size
            np_ = num_rays // (ps * ps)
            img_idx = jnp.broadcast_to(img_idx[:1], (num_rays,))
            ky, kx = jax.random.split(k_pix)
            y0 = jax.random.randint(ky, (np_,), 0, H - ps)
            x0 = jax.random.randint(kx, (np_,), 0, W - ps)
            dy = jnp.arange(ps)
            oy, ox = jnp.meshgrid(dy, dy, indexing="ij")
            off = oy.reshape(-1)[None, :] * W + ox.reshape(-1)[None, :]
            pix_idx = ((y0[:, None] * W + x0[:, None]) + off).reshape(-1)
        else:
            pix_idx = jax.random.randint(k_pix, (num_rays,), 0, H * W)

        gt_depth = None
        gt_depth_w = None
        if depth_data is not None and "sparse" in depth_data:
            # 10% of batches train on sparse-depth pixel coords of one image
            sc, sd, sw, sv = depth_data["sparse"]
            use_sd = jax.random.uniform(k_sd, ()) > 0.9
            one = img_idx[:1]
            R = sc.shape[1]
            reps = (num_rays + R - 1) // R
            coords = jnp.tile(sc[one[0]], reps)[:num_rays]
            img_idx = jnp.where(use_sd, jnp.broadcast_to(one, (num_rays,)),
                                img_idx)
            pix_idx = jnp.where(use_sd, coords, pix_idx)
            gt_depth = jnp.where(use_sd, jnp.tile(sd[one[0]], reps)[:num_rays], 0.0)
            gt_depth_w = jnp.where(
                use_sd,
                jnp.tile((sw * sv)[one[0]], reps)[:num_rays], 0.0)

        if intrinsics.ndim == 2:
            per_ray = jnp.take(intrinsics, img_idx, axis=0)     # [N, 4]
            intr_t = (per_ray[:, 0], per_ray[:, 1], per_ray[:, 2], per_ray[:, 3])
        else:
            intr_t = (intrinsics[0], intrinsics[1], intrinsics[2], intrinsics[3])

        rays = get_rays(jnp.take(poses, img_idx, axis=0), intr_t, H, W, pix_idx)
        rays_o, rays_d = rays["rays_o"], rays["rays_d"]

        gt_raw = images_u8[img_idx, rays["j"], rays["i"]].astype(jnp.float32) / 255.0
        if cfg.color_space == "linear":
            from ..data.rays import srgb_to_linear
            gt_raw = gt_raw.at[:, :3].set(srgb_to_linear(gt_raw[:, :3]))

        if depth_data is not None and "dense" in depth_data:
            gt_depth = depth_data["dense"][img_idx, rays["j"], rays["i"]]
            gt_depth_w = jnp.ones_like(gt_depth)

        if cfg.background == "white":
            bg = jnp.ones((num_rays, 3))
        else:
            bg = jax.random.uniform(k_bg, (num_rays, 3))

        if C == 4:
            gt_mask = gt_raw[:, 3:]
            gt_rgb = gt_raw[:, :3] * gt_mask + bg * (1.0 - gt_mask)
        else:
            gt_mask = None
            gt_rgb = gt_raw

        ind_code = None
        if cfg.ind_dim > 0:
            ind_code = jnp.take(params["individual_codes"], img_idx, axis=0)

        cnf = None
        if cam_near_far is not None:
            cnf = jnp.take(cam_near_far, img_idx, axis=0)

        out = render_train(
            params, render.occ_grid, rays_o, rays_d, bg, k_march,
            rspec, nspec, full_flag=dyn.full_shading, perturb=True,
            ind_code=ind_code, cam_near_far=cnf, max_level=dyn.max_level,
            cos_anneal_ratio=dyn.cos_anneal_ratio,
            normal_epsilon=dyn.normal_epsilon,
            aabb=jnp.asarray(self._aabb),
            # under shard_map each shard pools its share of the point budget;
            # small ray buckets can't fill the pool, so clamp it to the dense
            # sample count (the field costs O(pool) — no reason to evaluate
            # more pool rows than there are samples)
            pool_size=(None if self.pool_size is None
                       else min(max(128, self.pool_size // self.n_shards),
                                num_rays * rspec.num_fine)),
        )

        from .losses import CRITERIA
        criterion = CRITERIA[cfg.criterion]
        pred_rgb = out["image"]
        loss_per_ray = cfg.lambda_rgb * jnp.mean(criterion(pred_rgb, gt_rgb),
                                                 axis=-1)

        if gt_mask is not None and cfg.lambda_mask > 0:
            loss_per_ray = loss_per_ray + cfg.lambda_mask * (
                (out["weights_sum"] - gt_mask[:, 0]) ** 2
            )
        if gt_depth is not None and cfg.lambda_depth > 0:
            # depth loss with 1k-step ramp (utils.py:685-705)
            lam = cfg.lambda_depth * dyn.lambda_depth_ramp
            dmask = (gt_depth > 0).astype(jnp.float32) * gt_depth_w
            loss_per_ray = loss_per_ray + lam * dmask * (
                (out["depth"] - gt_depth) ** 2)
        # rays whose samples overflowed the point pool carry no loss this
        # step (rare; adaptive rays self-corrects, pool_overflow is logged)
        kept = out["ray_kept"].astype(jnp.float32)
        loss = jnp.sum(loss_per_ray * kept) / jnp.maximum(jnp.sum(kept), 1)

        if cfg.lambda_entropy > 0 or cfg.sharpen_steps > 0:
            w = jnp.clip(out["weights"], 1e-5, 1 - 1e-5)
            ent = -(w * jnp.log2(w) + (1 - w) * jnp.log2(1 - w))
            # padded samples contribute the w->0 limit (~0); mask for exactness
            ent = jnp.where(out["valid"], ent, 0.0)
            n_valid = jnp.maximum(jnp.sum(out["valid"]), 1)
            w2 = jnp.clip(out["weights_sum"], 1e-5, 1 - 1e-5)
            ent2 = -(w2 * jnp.log2(w2) + (1 - w2) * jnp.log2(1 - w2))
            loss = loss + dyn.lambda_entropy * (
                jnp.sum(ent) / n_valid + jnp.mean(ent2)
            )

        if cfg.lambda_specular > 0:
            spec_l = jnp.sum(out["speculars"] ** 2, axis=-1)
            spec_l = jnp.where(out["pp_valid"], spec_l, 0.0)
            n_valid = jnp.maximum(jnp.sum(out["pp_valid"]), 1)
            loss = loss + cfg.lambda_specular * jnp.sum(spec_l) / n_valid

        if cfg.sdf and cfg.lambda_eikonal > 0:
            # double-where: out-of-pool sentinel slots carry an exactly-zero
            # FD normal, and d(sqrt)/dx at 0 is inf — masking only the VALUE
            # still backprops NaN (0 * inf) into every parameter
            nrm2 = jnp.sum(out["normal"] ** 2, axis=-1)
            nrm = jnp.sqrt(jnp.where(out["pp_valid"], nrm2, 1.0))
            eik = jnp.where(out["pp_valid"], (nrm - 1.0) ** 2, 0.0)
            n_valid = jnp.maximum(jnp.sum(out["pp_valid"]), 1)
            loss = loss + cfg.lambda_eikonal * jnp.sum(eik) / n_valid

        if cfg.lambda_tv > 0:
            # subsample points for TV: the full set costs ~P*L*4 table gathers
            # for a 1e-8-weight regularizer (reference queries all points,
            # utils.py:801-823; a random subsample is an unbiased estimate)
            n_tv = min(16384, out["xyzs"].shape[0])
            xyz_tv = out["xyzs"][:n_tv]
            x01 = (xyz_tv + nspec.bound) / (2 * nspec.bound)
            inner = jnp.max(jnp.abs(xyz_tv), axis=-1) <= 1.0
            pw = jnp.where(out["pp_valid"][:n_tv],
                           jnp.where(inner, 1.0, 10.0), 0.0)
            table = params["sigma_table"] if nspec.separate_tables else params["table"]
            tv = hashgrid_tv_loss(table, x01, nspec.density_grid_spec, pw)
            loss = loss + cfg.lambda_tv * tv

        metrics = {
            "loss": loss,
            "psnr": -10.0 * jnp.log10(
                jnp.maximum(jnp.mean((pred_rgb - gt_rgb) ** 2), 1e-12)),
            "num_points": out["num_points"],
            "pool_overflow": out["pool_overflow"],
            "encode_resid": out["encode_resid"],
        }
        return loss, metrics

    def _build_step(self, num_rays: int, n_steps: int = 1):
        """Jitted train step.  n_steps > 1 runs that many steps per DISPATCH
        via lax.scan: the axon relay costs ~0.4-0.5 s per dispatch even when
        pipelined (stoch_decompose: render fwd+bwd 325 ms inside a fori_loop
        vs 808 ms per single-step dispatch), so chunking steps amortizes the
        dominant non-compute cost.  Per-step dynamics are recomputed on-device
        from state.step; the host-passed dyn is used only when n_steps == 1."""
        cfg = self.cfg
        optimizer = self.optimizer
        mesh = self.mesh

        def step_fn(state: TrainState, images_u8, poses, intrinsics,
                    cam_near_far, dyn: StepDynamics, depth_data=None):
            key, skey = jax.random.split(state.key)

            if mesh is not None:
                from jax.experimental.shard_map import shard_map
                n = self.n_shards
                per_shard = num_rays // n
                has_cnf = cam_near_far is not None

                has_depth = depth_data is not None

                def shard_loss(params, render, keys, images_u8, poses,
                               intrinsics, cnf, dyn_, dd):
                    loss, metrics = self._loss_and_metrics(
                        params, render, keys[0], images_u8, poses, intrinsics,
                        cnf if has_cnf else None, dyn_, per_shard,
                        depth_data=dd if has_depth else None)
                    # reduce over the data axis so outputs are replicated
                    loss = jax.lax.pmean(loss, "data")
                    metrics = {
                        "loss": loss,
                        "psnr": jax.lax.pmean(metrics["psnr"], "data"),
                        "num_points": jax.lax.psum(metrics["num_points"], "data"),
                        "pool_overflow": jax.lax.psum(
                            metrics["pool_overflow"], "data"),
                        "encode_resid": jax.lax.psum(
                            metrics["encode_resid"], "data"),
                    }
                    return loss, metrics

                cnf_arg = cam_near_far if has_cnf else jnp.zeros((1, 2))
                # depth data rides shard_map replicated (explicit specs; a
                # closure capture would bypass the sharding contract)
                dd_arg = depth_data if has_depth else {}

                def loss_fn(params):
                    keys = jax.random.split(skey, n)
                    f = shard_map(
                        shard_loss,
                        mesh=mesh,
                        in_specs=(P(), P(), P("data"), P(), P(), P(), P(),
                                  P(), P()),
                        out_specs=(P(), P()),
                        check_rep=False,
                    )
                    loss, metrics = f(params, state.render, keys, images_u8,
                                      poses, intrinsics, cnf_arg, dyn, dd_arg)
                    return loss, metrics
            else:
                def loss_fn(params):
                    return self._loss_and_metrics(
                        params, state.render, skey, images_u8, poses,
                        intrinsics, cam_near_far, dyn, num_rays,
                        depth_data=depth_data)

            (loss, metrics), grads = jax.value_and_grad(loss_fn, has_aux=True)(
                state.params)
            updates, opt_state = optimizer.update(grads, state.opt_state,
                                                  state.params)
            params = optax.apply_updates(state.params, updates)

            # EMA with torch_ema-style ramp: d = min(decay, (1+n)/(10+n))
            n = state.ema_count + 1
            d = jnp.minimum(0.95, (1.0 + n) / (10.0 + n))
            ema = jax.tree_util.tree_map(
                lambda e, p: e * d + p * (1.0 - d), state.ema_params, params)

            new_state = TrainState(
                params=params, opt_state=opt_state, ema_params=ema,
                ema_count=n, render=state.render, step=state.step + 1, key=key)
            return new_state, metrics

        if n_steps == 1:
            return jax.jit(step_fn, donate_argnums=(0,))

        def multi_fn(state: TrainState, images_u8, poses, intrinsics,
                     cam_near_far, dyn: StepDynamics, depth_data=None):
            def body(st, _):
                d = self._dynamics_traced(st.step)
                return step_fn(st, images_u8, poses, intrinsics,
                               cam_near_far, d, depth_data)
            state, ms = jax.lax.scan(body, state, None, length=n_steps)
            # last step's metrics, except overflow counters which reduce MAX
            # over the chunk so a transient budget bust is never hidden
            last = jax.tree_util.tree_map(lambda a: a[-1], ms)
            if "pool_overflow" in last:
                last["pool_overflow"] = jnp.max(ms["pool_overflow"], axis=0)
            return state, last

        return jax.jit(multi_fn, donate_argnums=(0,))

    def step_fn_for(self, num_rays: int, n_steps: int = 1):
        key = (num_rays, n_steps, self.net_spec.encode_gather_levels,
               self.net_spec.encode_winsort_levels)
        if key not in self._step_cache:
            self._step_cache[key] = self._build_step(num_rays, n_steps)
        return self._step_cache[key]

    # -------------------------------------------------------------- train loop
    def mark_untrained(self, dataset: Dataset):
        self.state = self.state._replace(render=mark_untrained_grid(
            self.state.render, dataset.poses, dataset.intrinsics_for(0),
            self.render_spec, aabb=self._aabb,
            cam_near_far=dataset.cam_near_far))

    def update_grid(self, step: int):
        from ..models.renderer import GRID_UPDATE_SLABS
        key = jax.random.fold_in(jax.random.PRNGKey(self.cfg.seed ^ 0x5EED), step)
        dyn = self.dynamics(step)
        # first update refreshes the full grid (all slabs); later ones rotate
        # one slab per call (memory stays bounded at H^3/8 queries per jit)
        n_update = step // max(self.cfg.update_extra_interval, 1)
        if n_update == 0:
            slabs = range(GRID_UPDATE_SLABS)
        else:
            slabs = [(n_update - 1) % GRID_UPDATE_SLABS]
        render = self.state.render
        for i, slab in enumerate(slabs):
            render = update_density_grid(
                self.state.params, render, jax.random.fold_in(key, i),
                self.render_spec, self.net_spec, dyn.max_level, slab=slab,
                trainable=self.cfg.trainable_density_grid,
                lambda_density=self.cfg.lambda_density,
                grid_lr=self.cfg.lr)
        self.state = self.state._replace(render=render)

    def _update_encode_routing(self, metrics) -> None:
        """Residual-rate probe: per level, route to the window kernel when
        out-of-window corners are rare, to the gather path when common.
        Hysteresis (0.15 / 0.35) avoids recompile flapping; each routing
        change costs one step recompile."""
        cnt = metrics.get("encode_resid")
        npts = int(metrics.get("num_points", 0))
        if cnt is None or npts <= 0:
            return
        rates = np.asarray(cnt, np.float64) / (8.0 * npts)
        cur = set(self.net_spec.encode_gather_levels)
        new = set(cur)
        for l, r in enumerate(rates):
            if l in cur and r < 0.15:
                new.discard(l)
            elif l not in cur and r > 0.35:
                new.add(l)
        if new != cur:
            gl = tuple(sorted(new))
            self.net_spec = dataclasses.replace(
                self.net_spec, encode_gather_levels=gl,
                encode_winsort_levels=(gl if self.cfg.winsort_fine else ()))
            self.log(f"[INFO] encode routing -> gather levels "
                     f"{sorted(new)}"
                     f"{' (winsort)' if self.cfg.winsort_fine else ''}"
                     f" (resid rates "
                     f"{[round(float(r), 2) for r in rates]})")

    def _bucket(self, n: int, lo: int = 1024, hi: int = 32768) -> int:
        # With pool compaction the field cost is O(num_points) regardless of
        # ray count; rays are bounded only by the sampler's dense per-slot
        # tensors ([N, Kf, Kc] one-hot ~ N*16KB), so allow rays up to 4x the
        # point budget over samples_per_ray (the reference reaches its 2^18
        # point target the same way, utils.py:796-797).
        cap = max(lo, (4 * self.cfg.num_points) // max(self.cfg.samples_per_ray, 1))
        if self.pool_size is None:
            # dense layout: encode cost scales with N*K — keep the old cap
            cap = max(lo, (2 * self.cfg.num_points) // max(self.cfg.samples_per_ray, 1))
        n = max(lo, min(hi, min(cap, n)))
        b = 1 << int(round(np.log2(n)))
        if b > min(hi, cap):     # round-to-nearest may overshoot the cap
            b >>= 1
        return max(b, lo)

    def sdf_pretrain(self, iters: int = 2000, batch_size: int = 8192):
        """Double-sphere SDF init (reference network.py:111-131); runs when
        --ckpt scratch in sdf mode (utils.py:592-594)."""
        opt = optax.adam(1e-3)

        # Scan-chunked dispatch: a Python step loop is `iters` sequential
        # host->chip round-trips, which over the axon relay is pure latency
        # (~20 min of silence for 2000 tiny steps); one scan over ALL iters
        # is a minutes-long single dispatch that trips the worker watchdog.
        # Middle ground (same pattern as the main train loop): scan `chunk`
        # optimizer steps per dispatch.
        chunk = min(100, iters)

        @jax.jit
        def run_chunk(params, ost, key):
            def body(carry, k):
                p, o = carry
                l, g = jax.value_and_grad(
                    lambda q: sdf_pretrain_loss(q, k, self.net_spec,
                                                batch_size=batch_size))(p)
                up, o = opt.update(g, o)
                return (optax.apply_updates(p, up), o), l

            (params, ost), ls = jax.lax.scan(
                body, (params, ost), jax.random.split(key, chunk))
            return params, ost, ls[-1]

        params, ost = self.state.params, opt.init(self.state.params)
        key = jax.random.PRNGKey(42)
        for _ in range(max(1, iters // chunk)):
            key, k = jax.random.split(key)
            params, ost, l = run_chunk(params, ost, k)
        self.log(f"[INFO] sdf pretrain done, loss={float(l):.6f}")
        self.state = self.state._replace(
            params=params, ema_params=jax.tree_util.tree_map(jnp.copy, params))

    def _prep_train_arrays(self, dataset: Dataset):
        """Device-resident training arrays, cached per dataset (shared by the
        main loop and the viewer's background-training chunks)."""
        if getattr(self, "_train_arrays_for", None) is dataset:
            return self._train_arrays
        cfg = self.cfg
        images = jnp.asarray(dataset.images)
        poses = jnp.asarray(dataset.poses)
        intrinsics = jnp.asarray(dataset.intrinsics)
        cam_near_far = (jnp.asarray(dataset.cam_near_far)
                        if dataset.cam_near_far is not None
                        and cfg.enable_cam_near_far else None)

        # depth supervision data (colmap), padded to static shapes
        depth_data = None
        if getattr(dataset, "dense_depth", None) is not None:
            depth_data = {"dense": jnp.asarray(dataset.dense_depth)}
        elif getattr(dataset, "sparse_depth", None) is not None:
            R = max(len(s[0]) for s in dataset.sparse_depth)
            B = len(dataset.sparse_depth)
            sc = np.zeros((B, R), np.int32)
            sd = np.zeros((B, R), np.float32)
            sw = np.zeros((B, R), np.float32)
            sv = np.zeros((B, R), np.float32)
            for i, (xy, d, w) in enumerate(dataset.sparse_depth):
                m = len(xy)
                sc[i, :m] = xy[:, 0] * dataset.W + xy[:, 1]
                sd[i, :m] = d
                sw[i, :m] = w
                sv[i, :m] = 1.0
            depth_data = {"sparse": (jnp.asarray(sc), jnp.asarray(sd),
                                     jnp.asarray(sw), jnp.asarray(sv))}
        self._train_arrays = (images, poses, intrinsics, cam_near_far,
                              depth_data)
        self._train_arrays_for = dataset
        return self._train_arrays

    def train_steps(self, dataset: Dataset, n: int = 16):
        """Run n training steps without eval/checkpoint side effects — the
        viewer's interleaved training chunk (reference gui.py:106-128 runs 16
        train steps per GUI frame).  Returns the last step's metrics."""
        cfg = self.cfg
        images, poses, intrinsics, cam_near_far, depth_data = (
            self._prep_train_arrays(dataset))
        last = None
        spd = max(1, int(getattr(cfg, "steps_per_dispatch", 1)))
        done = 0
        while done < n:
            step = int(self.state.step)
            if step % cfg.update_extra_interval == 0:
                self.update_grid(step)
            nr = (self._bucket(self.num_rays) if cfg.adaptive_num_rays
                  else cfg.num_rays)
            iv = cfg.update_extra_interval
            k = max(1, min(spd, n - done, iv - step % iv))
            fn = self.step_fn_for(nr, k)
            self.state, last = fn(self.state, images, poses, intrinsics,
                                  cam_near_far, self.dynamics(step),
                                  depth_data)
            done += k
            if (step + k) % cfg.update_extra_interval == 0:
                if cfg.adaptive_num_rays:
                    npts = int(last["num_points"])
                    if npts > 0:
                        self.num_rays = int(round(cfg.num_points / npts * nr))
                self._update_encode_routing(last)
        return last

    def train(self, dataset: Dataset, valid_dataset: Optional[Dataset] = None,
              max_steps: Optional[int] = None):
        cfg = self.cfg
        steps = max_steps if max_steps is not None else cfg.iters
        if cfg.mark_untrained:
            self.mark_untrained(dataset)

        # profiling hook (SURVEY.md §5.1): NERF2MESH_PROFILE=<dir> captures a
        # jax.profiler trace of a slice of training for xprof/tensorboard.
        prof_dir = os.environ.get("NERF2MESH_PROFILE")
        if prof_dir:
            jax.profiler.start_trace(prof_dir)
            self._prof_stop_at = int(self.state.step) + 32
        else:
            self._prof_stop_at = None

        images, poses, intrinsics, cam_near_far, depth_data = (
            self._prep_train_arrays(dataset))

        eval_interval = max(1, steps // max(cfg.n_eval, 1))
        save_interval = max(1, steps // max(cfg.n_ckpt, 1))

        t0 = time.time()
        last_metrics = None
        start = int(self.state.step)
        log_interval = max(1, steps // 10)
        spd = max(1, int(getattr(cfg, "steps_per_dispatch", 1)))
        if min(eval_interval, save_interval) < spd:
            # crossed() fires once per chunk even when a chunk spans several
            # interval boundaries, so short runs with large n_eval/n_ckpt get
            # fewer hooks than requested
            self.log(f"[WARN] eval/save interval ({eval_interval}/"
                     f"{save_interval}) < steps_per_dispatch ({spd}): hooks "
                     f"fire at most once per {spd}-step chunk")

        def next_boundary(s: int) -> int:
            """First step index > s at which a host-side hook MUST run.

            Only the grid-update cadence (and the profiler stop) align chunk
            boundaries: every distinct chunk length k compiles a separate
            scan program (~2 min per remote compile), so cutting chunks at
            log/eval/save steps (log_interval=iters/10 is rarely a multiple
            of steps_per_dispatch) scattered fresh compiles through training
            — measured 2.5 s/step vs the 0.7 s compute rate on the 96-view
            capstone.  Log/eval/save now fire on boundary CROSSING after the
            chunk instead, so k stays constant."""
            cands = [steps]
            iv = cfg.update_extra_interval
            cands.append((s // iv + 1) * iv)
            if self._prof_stop_at is not None:
                cands.append(max(self._prof_stop_at, s + 1))
            return min(cands)

        def crossed(prev: int, cur: int, interval: int) -> bool:
            return (cur // max(interval, 1)) > (prev // max(interval, 1))

        step = start
        while step < steps:
            if step % cfg.update_extra_interval == 0:
                self.update_grid(step)

            nr = self._bucket(self.num_rays) if cfg.adaptive_num_rays else cfg.num_rays
            # dispatch a scan chunk up to the next host hook (grid update,
            # adaptive-ray/routing probe; log/eval/save fire on crossing)
            k = max(1, min(spd, next_boundary(step) - step))
            fn = self.step_fn_for(nr, k)
            self.state, last_metrics = fn(
                self.state, images, poses, intrinsics, cam_near_far,
                self.dynamics(step), depth_data)
            prev_step = step
            step += k

            if self._prof_stop_at is not None and step > self._prof_stop_at:
                jax.block_until_ready(last_metrics["loss"])
                jax.profiler.stop_trace()
                self.log("[INFO] wrote profiler trace")
                self._prof_stop_at = None

            if step % cfg.update_extra_interval == 0:
                if cfg.adaptive_num_rays:
                    npts = int(last_metrics["num_points"])
                    if npts > 0:
                        self.num_rays = int(round(cfg.num_points / npts * nr))
                self._update_encode_routing(last_metrics)

            if crossed(prev_step, step, log_interval) or step == steps:
                m = {k: float(v) for k, v in last_metrics.items()
                     if np.ndim(v) == 0}
                self.log(
                    f"[step {step}/{steps}] loss={m['loss']:.6f} "
                    f"psnr={m['psnr']:.2f} points={int(m['num_points'])} "
                    f"rays={nr} {(time.time()-t0):.1f}s")
                self.log_scalars({"train/loss": m["loss"],
                                  "train/psnr": m["psnr"],
                                  "train/num_points": m["num_points"],
                                  "train/num_rays": nr})

            if valid_dataset is not None and crossed(prev_step, step,
                                                     eval_interval):
                # name by the crossed boundary, not the chunk end, so eval
                # artifact names are step-aligned across runs with different
                # steps_per_dispatch (actual step may be up to spd-1 later)
                bstep = (step // eval_interval) * eval_interval
                self.evaluate(valid_dataset, name=f"step{bstep}")

            if crossed(prev_step, step, save_interval) or step == steps:
                self.save_checkpoint()

        self.log(f"[INFO] training done: {steps} steps, "
                 f"{time.time()-t0:.1f}s")
        return last_metrics

    # ------------------------------------------------------------- eval/test
    def render_image(self, pose: np.ndarray, intrinsics: np.ndarray,
                     H: int, W: int, use_ema: bool = True,
                     chunk: int = 8192, shading: str = "full",
                     bg_color: float = 1.0,
                     seg_samples: int = 32,
                     stochastic: bool = False,
                     fused: bool = True) -> Dict[str, np.ndarray]:
        """Full-frame render: early-exit segmented march (eval path).

        The reference's alive-ray compaction loop (renderer.py:749-802)
        rebuilt for static shapes: each round renders `seg_samples` samples
        per still-alive ray at a fixed per-ray spacing, then finished rays
        (T below threshold or march exhausted) are compacted away on the
        host.  Opaque rays terminate after 1-2 rounds, and deep scenes can
        consume up to max_steps samples instead of a fixed per-ray cap.

        Dispatch economics (PERF.md): every device->host fetch through the
        axon relay costs up to ~1 s of latency, so the loop batches ALL
        alive rays per round (pow2 buckets, async dispatch) and fetches ONE
        packed [n, 6] array per round — the per-chunk-sync version spent
        5.5 s per 256^2 frame mostly waiting on ~60 fetches.  Valid samples
        are pool-compacted before the field evaluation (exact; lax.cond
        dense fallback on overflow).

        stochastic=True uses the 1-corner encoder estimate on fine levels
        (the train-time estimator) for latency-critical interactive preview
        (the viewer); metric evals keep it off.
        """
        params = self.state.ema_params if use_ema else self.state.params
        rspec = self.render_spec
        nspec = self.net_spec
        if stochastic:
            nspec = dataclasses.replace(nspec, encode_stochastic=True)

        fx, fy, cx, cy = np.asarray(intrinsics)
        rays = get_rays(jnp.asarray(pose[None]), (fx, fy, cx, cy), H, W)
        rays_o = np.asarray(rays["rays_o"])
        rays_d = np.asarray(rays["rays_d"])

        n = H * W
        eval_fine = max(rspec.num_fine, 128)     # dense-equivalent sample count
        seg_spec = RenderSpec(
            bound=rspec.bound, contract=rspec.contract,
            grid_size=rspec.grid_size, min_near=rspec.min_near,
            density_thresh=rspec.density_thresh, max_steps=rspec.max_steps,
            num_coarse=rspec.num_coarse, num_fine=seg_samples,
            dt_gamma=rspec.dt_gamma, sdf=rspec.sdf)
        pool = None if rspec.sdf else (-(-int(0.75 * chunk * seg_samples)
                                         // 128) * 128)

        if fused:
            # whole-frame march in one dispatch + one fetch (the host-loop
            # path below pays ~0.25 s of relay latency per round)
            from ..models.renderer import render_frame_queue
            n_pad = 1 << max(13, int(np.ceil(np.log2(max(n, 2)))))
            fkey = (n_pad, chunk, shading, seg_samples, stochastic, rspec)
            if getattr(self, "_eval_frame_key", None) != fkey:
                def _frame(params, occ, ro, rd, aabb):
                    return render_frame_queue(
                        params, occ, ro, rd, aabb, seg_spec, nspec,
                        chunk=min(chunk, n_pad), shading=shading,
                        pool_size=pool, eval_fine=eval_fine)
                self._eval_frame_fn = jax.jit(_frame)
                self._eval_frame_key = fkey
            ro = np.full((n_pad, 3), 1e6, np.float32)
            rd = np.zeros((n_pad, 3), np.float32)
            rd[:, 2] = 1.0                      # pad rays: miss the aabb
            ro[:n] = rays_o
            rd[:n] = rays_d
            out = self._eval_frame_fn(
                self.state.ema_params if use_ema else self.state.params,
                self.state.render.occ_grid, jnp.asarray(ro),
                jnp.asarray(rd), jnp.asarray(self._aabb))
            packed = np.asarray(jnp.concatenate(
                [out["image"], out["depth"][:, None],
                 out["weights_sum"][:, None]], axis=-1))[:n]   # one fetch
            image = packed[:, :3] + (1.0 - packed[:, 4:5]) * bg_color
            return {
                "image": image.reshape(H, W, 3),
                "depth": packed[:, 3].reshape(H, W),
                "weights_sum": packed[:, 4].reshape(H, W),
            }

        # rspec in the key: the viewer mutates render options live
        cache_key = (chunk, shading, seg_samples, stochastic, rspec)
        if getattr(self, "_eval_key", None) != cache_key:
            from ..models.renderer import render_eval_segment
            from ..ops.sampling import near_far_from_aabb, occupied_length

            def _prep(occ, ro, rd, aabb):
                nears, fars = near_far_from_aabb(ro, rd, aabb, rspec.min_near)
                olen = occupied_length(
                    ro, rd, occ, nears, fars,
                    num_coarse=rspec.num_coarse, grid_size=rspec.grid_size,
                    cascades=rspec.cascades, bound=rspec.bound,
                    contracted=rspec.contract, dt_gamma=rspec.dt_gamma,
                    max_steps=rspec.max_steps)
                return jnp.stack([nears, fars, olen], axis=-1)    # [b, 3]

            def _seg(params, occ, ro, rd, nears, fars, sdt):
                o = render_eval_segment(
                    params, occ, ro, rd, nears, fars, sdt, seg_spec, nspec,
                    shading=shading, pool_size=pool)
                return jnp.concatenate(
                    [o["image"], o["depth"][:, None],
                     o["weights_sum"][:, None], o["t_exit"][:, None]],
                    axis=-1)                                      # [b, 6]

            self._eval_prep = jax.jit(_prep)
            self._eval_seg = jax.jit(_seg)
            self._eval_key = cache_key

        occ = self.state.render.occ_grid
        aabb = jnp.asarray(self._aabb)
        dt_min = 2.0 * np.sqrt(3.0) / rspec.max_steps

        def batched(fn, arrays, m):
            """fn over m rows: pow2-bucket sub-batches dispatched async,
            ONE packed device fetch for the whole call."""
            outs = []
            head = 0
            while head < m:
                b = 1024
                while b < (m - head) and b < chunk:
                    b *= 2
                tail = min(head + b, m)
                padded = []
                for a in arrays:
                    buf = np.zeros((b,) + a.shape[1:], a.dtype)
                    buf[: tail - head] = a[head:tail]
                    if a.ndim == 2 and tail - head < b:
                        buf[tail - head:, -1] = 1.0   # non-degenerate dirs
                    padded.append(jnp.asarray(buf))
                outs.append(fn(*padded)[: tail - head])
                head = tail
            packed = outs[0] if len(outs) == 1 else jnp.concatenate(outs)
            return np.asarray(packed)                 # single device fetch

        prep = batched(lambda ro, rd: self._eval_prep(occ, ro, rd, aabb),
                       [rays_o, rays_d], n)
        nears, fars, olen = prep[:, 0].copy(), prep[:, 1], prep[:, 2]
        spacing = np.maximum(olen / eval_fine, dt_min).astype(np.float32)

        image = np.zeros((n, 3), np.float32)
        depth = np.zeros(n, np.float32)
        T = np.ones(n, np.float32)
        tcur = nears
        alive = olen > 0

        max_rounds = max(8, 2 * rspec.max_steps // max(seg_samples, 1))
        for _ in range(max_rounds):
            idx = np.nonzero(alive)[0]
            if idx.size == 0:
                break
            seg = batched(
                lambda ro, rd, nr, fr, sd: self._eval_seg(
                    params, occ, ro, rd, nr, fr, sd),
                [rays_o[idx], rays_d[idx], tcur[idx], fars[idx],
                 spacing[idx]],
                idx.size)
            si, sd_, sw, st = seg[:, :3], seg[:, 3], seg[:, 4], seg[:, 5]
            image[idx] += T[idx, None] * si
            depth[idx] += T[idx] * sd_
            T[idx] *= 1.0 - sw
            tcur[idx] = st
            alive[idx] = (T[idx] > rspec.T_thresh) & (tcur[idx] <= fars[idx])

        image += T[:, None] * bg_color
        return {
            "image": image.reshape(H, W, 3),
            "depth": depth.reshape(H, W),
            "weights_sum": (1.0 - T).reshape(H, W),
        }

    def evaluate(self, dataset: Dataset, name: str = "eval",
                 write_images: bool = False,
                 max_frames: Optional[int] = None,
                 stage1: Optional[bool] = None,
                 track_best: bool = True) -> Dict[str, float]:
        if stage1 is None:
            stage1 = self.cfg.stage > 0
        for m in self.metrics:
            m.clear()
        B = dataset.num_frames if max_frames is None else min(
            max_frames, dataset.num_frames)
        for i in range(B):
            if stage1:
                out = self.render_image_stage1(
                    dataset.poses[i], dataset.mvps[i],
                    dataset.intrinsics_for(i), dataset.H, dataset.W)
            else:
                out = self.render_image(dataset.poses[i],
                                        dataset.intrinsics_for(i),
                                        dataset.H, dataset.W)
            pred = out["image"]
            if dataset.images is not None:
                gt = dataset.images[i].astype(np.float32) / 255.0
                if gt.shape[-1] == 4:
                    gt = gt[..., :3] * gt[..., 3:] + 1.0 * (1 - gt[..., 3:])
                for m in self.metrics:
                    m.update(pred, gt)
            if write_images:
                from PIL import Image
                vdir = os.path.join(self.workspace, "validation")
                Image.fromarray((np.clip(pred, 0, 1) * 255).astype(np.uint8)).save(
                    os.path.join(vdir, f"{name}_{i:04d}_rgb.png"))
                # depth + |error| maps (reference utils.py:1293-1317)
                d = out["depth"]
                dn = (d - d.min()) / max(float(d.max() - d.min()), 1e-9)
                Image.fromarray((dn * 255).astype(np.uint8)).save(
                    os.path.join(vdir, f"{name}_{i:04d}_depth.png"))
                if dataset.images is not None:
                    err = np.abs(pred - gt).mean(-1)
                    Image.fromarray(
                        (np.clip(err * 4, 0, 1) * 255).astype(np.uint8)).save(
                        os.path.join(vdir, f"{name}_{i:04d}_error.png"))
        results = {m.name: m.measure() for m in self.metrics if m.N > 0}
        self.log(f"[eval {name}] " + " ".join(
            f"{k}={v:.4f}" for k, v in results.items()))
        self.stats["results"].append(results)
        # key by the eval name so val/test/s1_step rows stay distinguishable
        # in metrics.jsonl (ADVICE r4)
        self.log_scalars({f"{name}/" + k: v for k, v in results.items()})

        # track best checkpoint by the first metric (reference
        # utils.py:1383-1403 keeps a best ckpt with EMA weights)
        if results and track_best:
            first = list(results.values())[0]
            if self.stats["best"] is None or first > self.stats["best"]:
                self.stats["best"] = first
                self.save_checkpoint(tag="best")
                self.log(f"[INFO] new best checkpoint ({first:.4f})")
        return results

    def log_scalars(self, scalars: Dict[str, float]):
        """Scalar observability stream: workspace/metrics.jsonl, one JSON
        object per event (tensorboardX analog, utils.py:920-921)."""
        rec = {"step": int(self.state.step)}
        rec.update({k: float(v) for k, v in scalars.items()})
        with open(os.path.join(self.workspace, "metrics.jsonl"), "a") as f:
            f.write(json.dumps(rec) + "\n")

    # ------------------------------------------------------------- stage 1
    def setup_stage1(self, dataset: Dataset):
        """Load cascade meshes, create offset params, rebuild optimizer
        (renderer.py:121-165; utils.py:587-589 stage handoff)."""
        from ..models.stage1 import load_stage1_mesh

        # subdivision cap so projected bboxes fit the fragment block:
        # screen_px ~ edge * fl / z.  max_screen_edge is quoted at unit depth;
        # load_stage1_mesh scales it by the measured minimum camera depth and
        # enforces a hard face budget within the raster compaction budget K
        # (round-1 failure: z=1 assumption at z~2.5 scenes -> 42x faces ->
        # 97% of triangles silently dropped).
        # Crop size governs per-step vertex-gradient coverage: the reference
        # renders FULL frames every stage-1 step (renderer.py:816-921), and
        # its 30k-iter default gives each vertex ~30k photometric updates —
        # small crops cut that by (H*W)/crop^2.  Default matches the full
        # frame up to 256^2; cfg.s1_crop overrides.
        want = self.cfg.s1_crop if self.cfg.s1_crop > 0 else 256
        self._s1_crop = int(min(want, dataset.H, dataset.W))
        # per-image intrinsics (colmap): the tightest screen-edge bound comes
        # from the LONGEST focal length across views (ADVICE r3 #4)
        intr = np.asarray(dataset.intrinsics)
        fl = float(intr[:, :2].max() if intr.ndim == 2 else intr[:2].max())
        ss = max(int(self.cfg.ssaa), 1)
        # screen-resolution face budget: keep faces a few supersampled pixels
        # big so the antialias edge-crossing gradient (the only photometric
        # vertex-offset channel) stays live — see load_stage1_mesh docstring.
        # ~half the faces are front-facing, and the object covers less than
        # the full frame, so visible px/face lands below s1_px_per_face.
        if self.cfg.s1_px_per_face > 0:
            self._s1_face_budget = int(min(
                2.0 * dataset.H * dataset.W * ss * ss
                / self.cfg.s1_px_per_face, 3 * 2 ** 16))
        else:
            # 0 = disabled (config.py contract): no base-mesh decimation;
            # the raster compaction budget remains the only cap
            self._s1_face_budget = 0
        # ssaa multiplies the effective focal length at raster resolution
        max_edge = self._raster_spec().frag * 0.8 / (fl * ss)
        self.stage1_mesh = load_stage1_mesh(
            self.workspace, self.render_spec.cascades, mesh_path=self.cfg.mesh,
            use_updated=self.cfg.ckpt != "scratch", max_screen_edge=max_edge,
            poses=dataset.poses, max_faces=self._s1_face_budget,
            face_budget=self._s1_face_budget)
        self.log(f"[INFO] stage1 mesh: v={self.stage1_mesh.num_vertices} "
                 f"f={self.stage1_mesh.num_faces}")
        # surface snap is deferred to train_stage1: setup runs BEFORE the
        # stage-0 checkpoint restore (main.py order), and the snap needs the
        # trained field.  Resumed topologies (_updated meshes) are byte-
        # stable by contract — never snapped.
        upd = os.path.join(self.workspace, "mesh_stage0", "mesh_0_updated.ply")
        resumed = self.cfg.ckpt != "scratch" and os.path.exists(upd)
        self._s1_want_snap = (self.cfg.s1_snap_surface and not resumed
                              and not self.cfg.sdf and not self.cfg.mesh)
        self._reset_stage1_params()

    def _raster_spec(self):
        from ..models.rasterizer import RasterSpec
        mv = getattr(self, "mesh_f", None)
        # compaction budget K must cover the worst-case crop overlap, which
        # for an object-filling crop approaches the full face count (the
        # capstone measured 151k triangles overlapping one 128^2 crop of a
        # 233k-face mesh; K=2^17 dropped 13% of them).  Ceiling 2^18 keeps
        # [K, B, B] fragment tensors ~1.5 GB with autodiff — fine on 16 GB.
        # Sized from the PADDED face bucket so the spec (and the compiled
        # step keyed on it) is stable across refines within a bucket.
        ntri = (int(mv.shape[0]) if mv is not None
                else getattr(getattr(self, "stage1_mesh", None),
                             "num_faces", None))
        cap = 2 ** 15 if ntri is None else min(
            2 ** 18, 1 << int(np.ceil(np.log2(max(ntri, 2)))))
        # fragment-budget sufficiency is config arithmetic — size it at
        # setup instead of discovering silent drops mid-run (cap96v2 trained
        # its first 750 steps with 170-234k dropped fragments/step before the
        # ssaa budget-scaling fix landed).  Per overlapping face, live
        # fragments ~ (edge_px + 2)^2 at SUPERSAMPLED raster resolution
        # (bbox + the near-edge ring; back faces rasterize too); edge_px
        # follows from the px-per-face budget.  render_stage1_crop multiplies
        # max_frags by ssaa^2, so the base budget compares at demand/ssaa^2.
        ss = max(int(self.cfg.ssaa), 1)
        px = self.cfg.s1_px_per_face if self.cfg.s1_px_per_face > 0 else 6.0
        per_face = min(64.0, (np.sqrt(2.0 * px) + 2.0) ** 2)
        demand = int(min(ntri or 2 ** 15, cap) * per_face / (ss * ss))
        budget = 1 << 20
        while budget < demand and budget < (1 << 22):
            budget <<= 1
        if demand > budget:
            raise ValueError(
                f"stage-1 raster fragment demand ~{demand} exceeds the "
                f"maximum budget {1 << 22} (faces={ntri}, K={cap}, "
                f"ssaa={ss}); reduce the face count (s1_px_per_face) or "
                f"the crop size (s1_crop)")
        return RasterSpec(crop=getattr(self, "_s1_crop", 128),
                          max_tris=cap, frag=8, max_frags=budget)

    def _reset_stage1_params(self):
        """(Re)create offsets + error accumulators and re-init the optimizer
        after topology changes (utils.py:1208-1211).

        Device buffers are bucket-padded (stage1.pad_stage1_buffers) so that
        refines keep array shapes stable and the jitted step/eval wrappers
        hit their shape caches instead of recompiling (minutes per remote
        compile on this backend)."""
        from ..models.stage1 import pad_stage1_buffers
        mesh = self.stage1_mesh
        # floor buckets at the refine-growth budget (headroom start): see
        # pad_stage1_buffers(min_f)
        min_f = (getattr(self, "_s1_face_budget", 0)
                 if self.cfg.refine else 0)
        pad = pad_stage1_buffers(mesh, min_f=min_f)
        real_shape = (mesh.num_vertices, mesh.num_faces)
        Vp = len(pad["vertices"])
        params = dict(self.state.params)
        old = params.get("vertices_offsets")
        if (old is not None and old.shape[0] == Vp
                and getattr(self, "_s1_real_shape", None) == real_shape):
            # checkpoint-resumed with unchanged topology: keep offsets and
            # optimizer moments
            params["vertices_offsets"] = old
            opt_state = self.state.opt_state
        else:
            params["vertices_offsets"] = jnp.zeros((Vp, 3), jnp.float32)
            opt_state = self.optimizer.init(params)
            # topology changed: Adam moments reset is intended (reference
            # utils.py:1208-1211), but the SCHEDULE count must stay global —
            # a zeroed count re-enters the base lr's 500-step warmup after
            # EVERY refine (refines are 150-300 steps apart: the appearance
            # net trained at 1-60% lr for entire capstone runs, and the
            # vertex boost restarted at 30x each segment; the "jump" the
            # v4-v7 capstones showed after the LAST refine was the first
            # segment long enough to exit warmup)
            step0 = int(getattr(self.state, "step", 0) or 0)
            if step0 > 0:
                import optax.tree_utils as otu
                opt_state = otu.tree_set(
                    opt_state, count=jnp.asarray(step0, jnp.int32))
                # tree_set writes the SAME array object into every `count`
                # leaf of the optax chain; _build_stage1_step donates the
                # opt_state, and XLA rejects donating one buffer twice
                # ("Attempt to donate the same buffer twice in Execute()").
                # Give each leaf its own buffer.
                opt_state = jax.tree_util.tree_map(jnp.copy, opt_state)
        self.state = self.state._replace(
            params=params,
            opt_state=opt_state,
            ema_params=jax.tree_util.tree_map(jnp.copy, params))
        self.mesh_v = jnp.asarray(pad["vertices"])
        self.mesh_f = jnp.asarray(pad["triangles"])
        self.mesh_edges = jnp.asarray(pad["edges"])
        self.mesh_deg = jnp.asarray(pad["vert_degree"])
        self.mesh_pairs = jnp.asarray(pad["face_pairs"])
        self.s1_counts = jnp.asarray(pad["counts"])   # traced step arg
        self._s1_real_shape = real_shape
        self.tri_errors = jnp.zeros((len(pad["triangles"]),), jnp.float32)
        self.tri_counts = jnp.zeros((len(pad["triangles"]),), jnp.float32)
        self._stage1_step_fn = None

    def _build_stage1_step(self):
        cfg = self.cfg
        nspec = self.net_spec
        if (cfg.s1_stochastic and not cfg.sdf
                and not cfg.enable_offset_nerf_grad):
            # OPT-IN only (default off): the unbiased 1-corner encode noise
            # that averages harmlessly over ~64 volumetric samples per ray
            # in stage 0 lands UNDAMPED on stage-1's single surface query
            # per pixel — the v6 capstone ran it and its train loss floor
            # rose ~13% while evals went flat.  Saves ~150-200 ms of the
            # stage-1 step when enabled; excluded when offsets take
            # gradients THROUGH the field query (enable_offset_nerf_grad /
            # sdf): the estimator has no positional gradient.
            nspec = dataclasses.replace(nspec, encode_stochastic=True)
        rspec = self._raster_spec()
        optimizer = self.optimizer

        # one jitted wrapper per RasterSpec: mesh buffers are ARGUMENTS (not
        # closure constants), so refines with unchanged size buckets reuse
        # the compiled executable via jax.jit's shape cache instead of
        # recompiling (remote compiles cost minutes here; cache inert)
        cache = getattr(self, "_s1_step_cache", None)
        if cache is None:
            cache = self._s1_step_cache = {}
        if rspec in cache:
            return cache[rspec]

        crop_loss = make_stage1_crop_loss(cfg, nspec, rspec)
        ss = max(int(cfg.ssaa), 1)
        dev_mesh = self.mesh
        n_shards = self.n_shards

        def step_fn(state: TrainState, tri_errors, tri_counts,
                    mesh_v, mesh_f, mesh_edges, mesh_deg, mesh_pairs,
                    counts, images_u8,
                    poses, mvps, intrinsics, dyn: StepDynamics):
            key, kstep = jax.random.split(state.key)

            if dev_mesh is not None:
                # data parallelism over crops: each device renders its OWN
                # random (image, crop) and grads psum over "data" — the
                # stage-1 analog of the stage-0 ray-batch sharding (§2.3)
                from jax.experimental.shard_map import shard_map

                def shard_fn(params, keys, mv, mf, me, md, mp, cts,
                             imgs, ps, mvs, intr):
                    loss, (metrics, trig, lp) = crop_loss(
                        params, keys[0], mv, mf, me, md, mp, cts,
                        imgs, ps, mvs, intr)
                    loss = jax.lax.pmean(loss, "data")
                    metrics = {
                        "loss": loss,
                        "psnr": jax.lax.pmean(metrics["psnr"], "data"),
                        "psnr_white": jax.lax.pmean(
                            metrics["psnr_white"], "data"),
                        "overflow": jax.lax.psum(
                            metrics["overflow"], "data"),
                    }
                    return loss, (metrics, trig, lp)

                def loss_fn(params):
                    keys = jax.random.split(kstep, n_shards)
                    f = shard_map(
                        shard_fn, mesh=dev_mesh,
                        in_specs=(P(), P("data"), P(), P(), P(), P(), P(),
                                  P(), P(), P(), P(), P()),
                        out_specs=(P(), (P(), P("data"), P("data"))),
                        check_rep=False)
                    return f(params, keys, mesh_v, mesh_f, mesh_edges,
                             mesh_deg, mesh_pairs, counts, images_u8,
                             poses, mvps, intrinsics)
            else:
                def loss_fn(params):
                    return crop_loss(params, kstep, mesh_v, mesh_f,
                                     mesh_edges, mesh_deg, mesh_pairs,
                                     counts, images_u8, poses, mvps,
                                     intrinsics)

            (loss, (metrics, trig_id, loss_pix)), grads = jax.value_and_grad(
                loss_fn, has_aux=True)(state.params)

            updates, opt_state = optimizer.update(grads, state.opt_state,
                                                  state.params)
            params = optax.apply_updates(state.params, updates)

            # per-face error accumulation (renderer.py:923-943); trig_id is at
            # supersampled resolution — replicate the per-GT-pixel loss
            tid = trig_id.reshape(-1)
            lp = jax.lax.stop_gradient(loss_pix)
            if ss > 1:
                lp = jnp.repeat(jnp.repeat(lp, ss, axis=0), ss, axis=1)
            lp = lp.reshape(-1)
            valid = tid >= 0
            safe = jnp.where(valid, tid, 0)
            tri_errors = tri_errors.at[safe].add(jnp.where(valid, lp, 0.0))
            tri_counts = tri_counts.at[safe].add(valid.astype(jnp.float32))

            new_state = TrainState(
                params=params, opt_state=opt_state,
                ema_params=state.ema_params,     # no EMA in stage 1 (main.py:241)
                ema_count=state.ema_count,
                render=state.render, step=state.step + 1, key=key)
            return new_state, tri_errors, tri_counts, metrics

        fn = jax.jit(step_fn, donate_argnums=(0, 1, 2))
        cache[rspec] = fn
        return fn

    def train_stage1(self, dataset: Dataset, valid_dataset: Optional[Dataset] = None,
                     max_steps: Optional[int] = None,
                     diag_datasets: Optional[Dict[str, Dataset]] = None):
        from ..models.stage1 import refine_and_decimate
        cfg = self.cfg
        steps = max_steps if max_steps is not None else cfg.iters
        # vertex-lr decay must span the ACTUAL step budget, not cfg.iters
        # (ADVICE r3 #3: max_steps callers otherwise end at a boosted lr)
        if steps != cfg.iters and getattr(self, "_vert_horizon", None) != steps:
            self.optimizer = make_optimizer(cfg, vert_horizon=steps)
            self._vert_horizon = steps
            self._s1_step_cache = {}       # step fn closes over the optimizer
            self._stage1_step_fn = None
        images = jnp.asarray(dataset.images)
        poses = jnp.asarray(dataset.poses)
        mvps = jnp.asarray(dataset.mvps)
        intrinsics = jnp.asarray(dataset.intrinsics)

        eval_interval = max(1, steps // max(cfg.n_eval, 1))
        t0 = time.time()
        start = int(self.state.step)
        if getattr(self, "_s1_want_snap", False) and start == 0:
            from ..models.stage1 import (pad_stage1_buffers,
                                         snap_to_apparent_surface)
            self._s1_want_snap = False
            mesh = self.stage1_mesh
            v1 = int(mesh.v_cumsum[1])
            # the window must COVER the placement error for E[t] to reach
            # it: the round-4 oracle probe measured mcubes verts mean 0.031
            # p99 0.079 ngp units off the true surface (the apparent-surface
            # offset is a density-ramp property, roughly independent of the
            # marching resolution), while the old 4-voxel band could only
            # recover 0.0077.  Absolute 0.09 floor covers p99; 3 shrinking
            # passes then converge to sub-voxel.  The inner cascade spans
            # [-1,1] ngp regardless of bound, so the floor is scale-safe.
            band = max(12.0 * 2.0 * cfg.real_bound / max(cfg.mcubes_reso, 1),
                       0.09)
            mesh.vertices[:v1] = snap_to_apparent_surface(
                self.state.params, mesh.vertices[:v1],
                mesh.triangles[:int(mesh.f_cumsum[1])], self.net_spec,
                band=band, n_samples=64, passes=3)
            min_f = (getattr(self, "_s1_face_budget", 0)
                     if self.cfg.refine else 0)
            self.mesh_v = jnp.asarray(
                pad_stage1_buffers(mesh, min_f=min_f)["vertices"])
            # persist the snapped geometry under the refine contract
            # (mesh_0_updated.ply, never re-snapped): offsets train relative
            # to SNAPPED vertices, so a resumed run or post-hoc eval that
            # reloaded the raw mesh_0.ply would silently render offsets
            # against the wrong base geometry
            from ..meshing.io import write_ply
            mdir = os.path.join(self.workspace, "mesh_stage0")
            os.makedirs(mdir, exist_ok=True)
            write_ply(os.path.join(mdir, "mesh_0_updated.ply"),
                      mesh.vertices[:v1],
                      mesh.triangles[:int(mesh.f_cumsum[1])])
        last = None
        for step in range(start, steps):
            if cfg.refine and (step + 1) in cfg.refine_steps:
                self.log(f"[INFO] refine at step {step+1}")
                v_real, f_real = self._s1_real_shape
                self.stage1_mesh = refine_and_decimate(
                    self.stage1_mesh,
                    np.asarray(self.state.params["vertices_offsets"])[:v_real],
                    np.asarray(self.tri_errors)[:f_real],
                    np.asarray(self.tri_counts)[:f_real],
                    cfg, self.workspace,
                    max_faces=getattr(self, "_s1_face_budget", 0))
                self._reset_stage1_params()

            if self._stage1_step_fn is None:
                self._stage1_step_fn = self._build_stage1_step()

            (self.state, self.tri_errors, self.tri_counts,
             last) = self._stage1_step_fn(
                self.state, self.tri_errors, self.tri_counts,
                self.mesh_v, self.mesh_f, self.mesh_edges, self.mesh_deg,
                self.mesh_pairs, self.s1_counts, images, poses,
                mvps, intrinsics, self.dynamics(step))

            if (step + 1) % max(1, steps // 10) == 0 or step == steps - 1:
                m = {k: float(v) for k, v in last.items()}
                self.log(f"[stage1 {step+1}/{steps}] loss={m['loss']:.6f} "
                         f"psnr={m['psnr']:.2f} "
                         f"psnr_white={m.get('psnr_white', m['psnr']):.2f} "
                         f"f={self.stage1_mesh.num_faces} "
                         f"{(time.time()-t0):.1f}s")
                if m.get("overflow", 0) > 0:
                    self.log(f"[WARN] raster budget overflow: "
                             f"{int(m['overflow'])} triangles dropped this "
                             f"step — renders have holes; reduce mesh faces "
                             f"or raise max_tris")
            if valid_dataset is not None and (step + 1) % eval_interval == 0:
                self.evaluate(valid_dataset, name=f"s1_step{step+1}",
                              stage1=True)
                # optional extra eval sets through the SAME eval path (e.g.
                # a train-view subset: the train/val gap at matched
                # estimator separates view overfitting from estimator
                # asymmetry — the round-4 v9 capstone could not tell)
                for dname, dset in (diag_datasets or {}).items():
                    self.evaluate(dset, name=f"{dname}_step{step+1}",
                                  stage1=True, track_best=False)
            if (step + 1) % max(1, steps // max(cfg.n_ckpt, 1)) == 0 \
                    or step == steps - 1:
                self.save_checkpoint()
        return last

    def render_image_stage1(self, pose: np.ndarray, mvp: np.ndarray,
                            intrinsics, H: int, W: int,
                            bg_color: float = 1.0) -> Dict[str, np.ndarray]:
        """Full-frame stage-1 render by looping crops."""
        from ..models.stage1 import render_stage1_crop
        from ..data.rays import pixel_dirs_cam
        rspec = self._raster_spec()
        Cp = rspec.crop
        nspec = self.net_spec
        params = self.state.params

        # mesh buffers are bucket-padded args: the wrapper survives refines
        # and jax.jit's shape cache avoids recompiles within a bucket
        # physically supersampled eval: render at ssaa and average-pool, so
        # the reported silhouette is the mesh's true area coverage (the web
        # renderer consumes the mesh with native-res MSAA; a 1-spp aa eval
        # under-reads rim coverage by ~0.12 alpha — round-3 s1_cov_probe)
        ss = max(int(self.cfg.ssaa), 1)
        cache = getattr(self, "_s1_eval_cache", None)
        if cache is None:
            cache = self._s1_eval_cache = {}
        cache_key = (rspec, H, W, ss)
        if cache_key not in cache:
            @jax.jit
            def _eval(params, mesh_v, mesh_f, f_real, mvp, origin, dirs, bg):
                return render_stage1_crop(
                    params, params["vertices_offsets"], mesh_v, mesh_f,
                    mvp, origin, dirs, bg, nspec, rspec, H, W,
                    shading="full", contracted=self.cfg.contract,
                    alpha_mode=self.cfg.s1_alpha_eval, f_valid=f_real,
                    ssaa=ss, shell_k=self.cfg.s1_shell,
                    shell_h=self.cfg.s1_shell_h)
            cache[cache_key] = _eval
        _eval_fn = cache[cache_key]

        image = np.zeros((H, W, 3), np.float32)
        depth = np.zeros((H, W), np.float32)
        wsum = np.zeros((H, W), np.float32)
        overflow = 0
        fx, fy, cx, cy = np.asarray(intrinsics)
        Cs = Cp * ss
        bg = jnp.full((Cs, Cs, 3), bg_color)
        sub = (np.arange(Cs) + 0.5) / ss
        for y0 in range(0, H, Cp):
            for x0 in range(0, W, Cp):
                jj, ii = np.meshgrid(y0 + sub, x0 + sub, indexing="ij")
                dcam = np.stack([(ii - cx) / fx, -(jj - cy) / fy,
                                 -np.ones_like(ii)], -1)
                dirs = (dcam.reshape(-1, 3) @ np.asarray(pose)[:3, :3].T
                        ).reshape(Cs, Cs, 3).astype(np.float32)
                out = _eval_fn(params, self.mesh_v, self.mesh_f,
                               self.s1_counts[1], jnp.asarray(mvp),
                               jnp.asarray([y0, x0]),
                               jnp.asarray(dirs), bg)
                h = min(Cp, H - y0); w = min(Cp, W - x0)
                image[y0:y0+h, x0:x0+w] = np.asarray(out["image"])[:h, :w]
                depth[y0:y0+h, x0:x0+w] = np.asarray(out["depth"])[:h, :w]
                wsum[y0:y0+h, x0:x0+w] = np.asarray(out["weights_sum"])[:h, :w]
                overflow += int(out["overflow"])
        if overflow > 0:
            self.log(f"[WARN] stage-1 eval raster overflow: {overflow} "
                     f"triangles dropped across crops — image has holes")
        return {"image": image, "depth": depth, "weights_sum": wsum}

    def test_video(self, dataset: Dataset, name: str = "test",
                   fps: int = 24) -> Optional[str]:
        """Render the test trajectory and write an mp4 (utils.py:997-1006)."""
        frames = []
        for i in range(dataset.num_frames):
            if self.cfg.stage > 0:
                out = self.render_image_stage1(
                    dataset.poses[i], dataset.mvps[i],
                    dataset.intrinsics_for(i), dataset.H, dataset.W)
            else:
                out = self.render_image(dataset.poses[i],
                                        dataset.intrinsics_for(i),
                                        dataset.H, dataset.W)
            frames.append((np.clip(out["image"], 0, 1) * 255).astype(np.uint8))
        path = os.path.join(self.workspace, f"{name}_rgb.mp4")
        try:
            import imageio
            imageio.mimwrite(path, frames, fps=fps, quality=8,
                             macro_block_size=1)
        except Exception:  # pragma: no cover - codec availability
            try:
                from PIL import Image
                path = os.path.join(self.workspace, f"{name}_rgb.gif")
                ims = [Image.fromarray(f) for f in frames]
                ims[0].save(path, save_all=True, append_images=ims[1:],
                            duration=int(1000 / fps), loop=0)
                self.log("[WARN] no mp4 codec; wrote GIF instead")
            except Exception as e:
                path = os.path.join(self.workspace, f"{name}_frames.npz")
                np.savez_compressed(path, frames=np.stack(frames))
                self.log(f"[WARN] video writers unavailable ({e}); wrote {path}")
        self.log(f"[INFO] wrote test video: {path}")
        return path

    def export_stage1(self, resolution: int = 4096):
        """Web-renderer package: OBJ + baked textures + mlp.json
        (renderer.py:297-468)."""
        from ..meshing.export import export_stage1_package
        out_dir = os.path.join(self.workspace, "mesh_stage1")
        export_stage1_package(self, out_dir, h0=resolution, w0=resolution)

    def save_mesh(self, resolution: int = 512, decimate_target: float = 3e5,
                  dataset: Optional[Dataset] = None):
        """Stage-0 coarse mesh export (renderer.py:471-672)."""
        from ..meshing.export import export_stage0_mesh
        out_dir = os.path.join(self.workspace, "mesh_stage0")
        os.makedirs(out_dir, exist_ok=True)
        export_stage0_mesh(
            self, out_dir, resolution=resolution,
            decimate_target=int(decimate_target), dataset=dataset)

    # ------------------------------------------------------------ checkpoints
    def _ckpt_path(self, tag: str) -> str:
        ext = ".ocp" if self.cfg.ckpt_backend == "orbax" else ".ckpt"
        return os.path.join(self.workspace, "checkpoints",
                            f"ngp_stage{self.cfg.stage}_{tag}{ext}")

    def save_checkpoint(self, tag: Optional[str] = None):
        tag = tag or f"{int(self.state.step):07d}"
        payload = {
            "state": jax.tree_util.tree_map(np.asarray, self.state),
            "num_rays": self.num_rays,
            "stage": self.cfg.stage,
            "stats": self.stats,
            "format": 2,
            # architecture snapshot for drift diagnostics on load
            "net_spec": repr(self.net_spec),
        }
        if getattr(self, "_s1_real_shape", None) is not None:
            # real (unpadded) topology: offsets are only transferable to the
            # exact same mesh, even when bucket padding makes shapes match
            payload["s1_shape"] = tuple(self._s1_real_shape)
        save = (self._save_orbax if self.cfg.ckpt_backend == "orbax"
                else self._save_pickle)
        save(payload, self._ckpt_path(tag))
        save(payload, self._ckpt_path("latest"))
        # rolling window of 2 (utils.py:1373-1379)
        cdir = os.path.join(self.workspace, "checkpoints")
        cks = sorted(
            p for p in os.listdir(cdir)
            if p.startswith(f"ngp_stage{self.cfg.stage}") and
            "latest" not in p and "best" not in p and
            (p.endswith(".ckpt") or p.endswith(".ocp")))
        import shutil
        for p in cks[:-2]:
            full = os.path.join(cdir, p)
            shutil.rmtree(full) if os.path.isdir(full) else os.remove(full)

    @staticmethod
    def _save_pickle(payload: Dict[str, Any], path: str):
        tmp = path + ".tmp"
        with open(tmp, "wb") as f:
            pickle.dump(payload, f)
        os.replace(tmp, path)

    def _save_orbax(self, payload: Dict[str, Any], path: str):
        """Orbax-backed save: checksummed OCDBT array store (atomic finalize)
        + a JSON metadata sidecar inside the checkpoint directory."""
        import shutil
        import orbax.checkpoint as ocp
        path = os.path.abspath(path)
        if os.path.exists(path):
            shutil.rmtree(path)
        with ocp.PyTreeCheckpointer() as ckptr:
            ckptr.save(path, payload["state"])
        meta = {k: v for k, v in payload.items() if k != "state"}
        with open(os.path.join(path, "n2m_meta.json"), "w") as f:
            json.dump(meta, f, default=float)

    @staticmethod
    def _norm_path(p) -> Tuple[str, ...]:
        """Normalize a jax key path so namedtuple attributes, dict keys and
        sequence indices compare equal between a live pytree and an orbax raw
        restore (which returns nested dicts)."""
        out = []
        for k in p:
            for attr in ("name", "key", "idx"):
                if hasattr(k, attr):
                    out.append(str(getattr(k, attr)))
                    break
            else:
                out.append(str(k))
        return tuple(out)

    def _tree_from_raw(self, template, raw):
        """Rebuild `template`'s exact pytree types (namedtuples, optax
        states) from an orbax raw restore, matching leaves by normalized
        path.  Missing/shape-drifted leaves keep the template value.
        Returns (tree, fully_matched)."""
        tp, treedef = jax.tree_util.tree_flatten_with_path(template)
        rmap = {self._norm_path(p): v for p, v in
                jax.tree_util.tree_flatten_with_path(raw)[0]}
        leaves, ok = [], True
        for p, v in tp:
            r = rmap.get(self._norm_path(p))
            if r is None or np.shape(r) != np.shape(v):
                leaves.append(v)
                ok = False
            else:
                leaves.append(np.asarray(r))
        return jax.tree_util.tree_unflatten(treedef, leaves), ok

    def _load_orbax(self, path: str) -> Dict[str, Any]:
        """Restore an orbax checkpoint directory into a pickle-equivalent
        payload.  The array tree is restored raw (nested dicts) and rebuilt
        against the live TrainState's structure, so schema drift degrades to
        the same non-strict partial-restore semantics as the pickle path."""
        import orbax.checkpoint as ocp
        with ocp.PyTreeCheckpointer() as ckptr:
            raw = ckptr.restore(os.path.abspath(path))
        state, ok = self._tree_from_raw(
            jax.tree_util.tree_map(np.asarray, self.state), raw)
        payload = {"state": state, "partial": not ok}
        mpath = os.path.join(path, "n2m_meta.json")
        if os.path.exists(mpath):
            with open(mpath) as f:
                payload.update(json.load(f))
        if not ok:
            self.log("[WARN] orbax checkpoint schema drift: partial restore "
                     "(matching arrays only; optimizer restarts)")
        return payload

    def load_checkpoint(self, path: Optional[str] = None,
                        stage: Optional[int] = None) -> bool:
        stage = self.cfg.stage if stage is None else stage
        if path is None:
            base = os.path.join(self.workspace, "checkpoints",
                                f"ngp_stage{stage}_latest")
            # auto-detect the serialization format of what's on disk
            path = next((base + e for e in (".ckpt", ".ocp")
                         if os.path.exists(base + e)), base + ".ckpt")
        if not os.path.exists(path):
            return False
        if os.path.isdir(path):
            payload = self._load_orbax(path)
        else:
            with open(path, "rb") as f:
                payload = pickle.load(f)
        st = payload["state"]

        # bucket padding makes offsets SHAPES match across different real
        # topologies — transfer them only when the real (v, f) counts match
        ck_shape = payload.get("s1_shape")
        if (ck_shape is not None
                and getattr(self, "_s1_real_shape", None) is not None
                and tuple(ck_shape) != tuple(self._s1_real_shape)
                and isinstance(st.params, dict)
                and "vertices_offsets" in st.params):
            self.log(f"[WARN] checkpoint stage-1 topology {tuple(ck_shape)} "
                     f"!= current {tuple(self._s1_real_shape)} — dropping "
                     "saved vertices_offsets (optimizer restarts)")
            p = dict(st.params); p.pop("vertices_offsets")
            e = dict(st.ema_params); e.pop("vertices_offsets", None)
            st = st._replace(params=p, ema_params=e)

        # non-strict parameter merge (reference load_checkpoint logs
        # missing/unexpected keys and keeps going, utils.py:1407-1473):
        # keys absent from the checkpoint keep their fresh init; unexpected
        # or shape-mismatched entries are dropped — both reported.
        def merge(cur, loaded, scope):
            cur_paths, treedef = jax.tree_util.tree_flatten_with_path(cur)
            ld = {jax.tree_util.keystr(p): v for p, v in
                  jax.tree_util.tree_flatten_with_path(loaded)[0]}
            out, clean = [], True
            seen = set()
            for p, v in cur_paths:
                k = jax.tree_util.keystr(p)
                seen.add(k)
                if k not in ld:
                    self.log(f"[WARN] checkpoint {scope}{k}: missing — "
                             "keeping fresh init")
                    out.append(v)
                    clean = False
                elif np.shape(ld[k]) != np.shape(v):
                    self.log(f"[WARN] checkpoint {scope}{k}: shape "
                             f"{np.shape(ld[k])} vs {np.shape(v)} — "
                             "keeping fresh init")
                    out.append(v)
                    clean = False
                else:
                    out.append(jnp.asarray(ld[k]))
            for k in ld:
                if k not in seen:
                    self.log(f"[WARN] checkpoint {scope}{k}: unexpected — "
                             "dropped")
                    clean = False
            return jax.tree_util.tree_unflatten(treedef, out), clean

        to_dev = lambda t: jax.tree_util.tree_map(jnp.asarray, t)
        params, pok = merge(self.state.params, st.params, "params")
        ema, eok = merge(self.state.ema_params, st.ema_params, "ema")
        render_ok = all(
            np.shape(a) == np.shape(b)
            for a, b in zip(jax.tree_util.tree_leaves(self.state.render),
                            jax.tree_util.tree_leaves(st.render)))
        render = to_dev(st.render) if render_ok else self.state.render
        if not render_ok:
            self.log("[WARN] checkpoint render state shape drift; keeping "
                     "fresh occupancy grid")

        if payload.get("stage", 0) != self.cfg.stage or not (pok and eok) \
                or payload.get("partial", False):
            # stage handoff (utils.py:587-589) or partial restore: model
            # params only — optimizer/step restart
            self.state = self.state._replace(
                params=params, ema_params=ema, render=render)
        else:
            self.state = TrainState(
                params=params,
                opt_state=to_dev(st.opt_state),
                ema_params=ema,
                ema_count=jnp.asarray(st.ema_count),
                render=render,
                step=jnp.asarray(st.step),
                key=jnp.asarray(st.key),
            )
        self.num_rays = payload.get("num_rays", self.cfg.num_rays)
        self.log(f"[INFO] loaded checkpoint {path} (step {int(self.state.step)})")
        return True
