"""Stage-0 coarse mesh export (parity target: reference renderer.py:471-672
export_stage0).

Pipeline: chunked jitted density query on the mcubes grid (masked by the
trained occupancy grid) -> marching tetrahedra (host) -> optional visibility
culling against the training cameras -> clean -> decimate -> mesh_0.ply.
For bound > 1, outer cascades export occupancy-derived shells (non-SDF) or a
contracted SDF surface, carved around the inner region (renderer.py:546-672).
"""

from __future__ import annotations

import os
from typing import Optional

import numpy as np
import jax
import jax.numpy as jnp

from ..ops.contraction import uncontract_np
from .marching_cubes import marching_cubes
from . import meshops
from .io import write_ply


def _query_density_grid(trainer, resolution: int, bound: float = 1.0,
                        contracted_query: bool = False) -> np.ndarray:
    """Chunked density query on a resolution^3 grid over [-bound, bound]^3."""
    from ..models.network import density

    params = trainer.state.ema_params
    nspec = trainer.net_spec
    chunk = 2 ** 17

    @jax.jit
    def q(pts):
        return density(params, pts, nspec)

    ax = np.linspace(-1, 1, resolution, dtype=np.float32)
    out = np.empty(resolution ** 3, np.float32)
    # build points lazily per chunk to cap host memory
    xs, ys, zs = np.meshgrid(ax, ax, ax, indexing="ij")
    pts = np.stack([xs.ravel(), ys.ravel(), zs.ravel()], -1) * bound
    n = pts.shape[0]
    for head in range(0, n, chunk):
        tail = min(head + chunk, n)
        block = np.zeros((chunk, 3), np.float32)
        block[: tail - head] = pts[head:tail]
        vals = np.asarray(q(jnp.asarray(block)))
        out[head:tail] = vals[: tail - head]
    return np.nan_to_num(out.reshape(resolution, resolution, resolution), 0.0)


def mark_unseen_triangles(verts: np.ndarray, tris: np.ndarray,
                          mvps: np.ndarray, H: int, W: int) -> np.ndarray:
    """Faces never rasterized by any camera (renderer.py:946-981).

    Uses the JAX rasterizer's triangle-id buffer per view.
    Returns bool [M] mask, True = unseen.
    """
    from ..models.rasterizer import rasterize_trig_id

    seen = np.zeros(len(tris), bool)
    v = jnp.asarray(verts)
    t = jnp.asarray(tris)
    for mvp in mvps:
        tid = np.asarray(rasterize_trig_id(v, t, jnp.asarray(mvp), H, W))
        ids = np.unique(tid)
        ids = ids[ids >= 0]
        seen[ids] = True
    return ~seen


def export_stage0_mesh(trainer, out_dir: str, resolution: int = 512,
                       decimate_target: int = 300000,
                       dataset=None,
                       S: int = 128) -> None:
    cfg = trainer.cfg
    rspec = trainer.render_spec
    state = trainer.state
    os.makedirs(out_dir, exist_ok=True)

    density_thresh = min(float(state.render.mean_density), cfg.density_thresh)

    # ---- inner mesh in [-1, 1]^3
    sigmas = _query_density_grid(trainer, resolution, bound=1.0)

    if not cfg.sdf:
        # mask out untrained/unoccupied regions using the density grid
        # (renderer.py:505-513)
        grid = np.asarray(state.render.density_grid[0])
        reps = int(np.ceil(resolution / grid.shape[0]))
        mask = np.repeat(np.repeat(np.repeat(
            grid, reps, 0), reps, 1), reps, 2)[:resolution, :resolution, :resolution]
        sigmas = sigmas * (mask > density_thresh)
        verts, tris = marching_cubes(sigmas, density_thresh)
    else:
        verts, tris = marching_cubes(-sigmas, 0.0)

    verts = verts / (resolution - 1.0) * 2 - 1

    if dataset is not None and cfg.mesh_visibility_culling and len(tris) > 0:
        try:
            vis_mask = mark_unseen_triangles(
                verts, tris, dataset.mvps, dataset.H, dataset.W)
            verts, tris = meshops.remove_masked_trigs(
                verts, tris, vis_mask, dilation=cfg.visibility_mask_dilation)
        except ImportError:
            trainer.log("[WARN] rasterizer unavailable; skipping visibility culling")

    verts, tris = meshops.clean_mesh(
        verts, tris, min_f=cfg.clean_min_f, min_d=cfg.clean_min_d)

    if decimate_target > 0 and len(tris) > decimate_target:
        verts, tris = meshops.decimate_mesh(verts, tris, decimate_target)

    write_ply(os.path.join(out_dir, "mesh_0.ply"), verts, tris)
    trainer.log(f"[INFO] exported mesh_0.ply: v={verts.shape} f={tris.shape}")

    # ---- outer cascades (bound > 1), renderer.py:546-672
    if rspec.grid_bound > 1:
        cascades = rspec.cascades
        grid_all = np.asarray(state.render.density_grid)
        target_reso = cfg.env_reso
        dec = decimate_target // 2
        if cfg.sdf:
            # contracted-space surface, carve the center (renderer.py:549-603)
            sig = _query_density_grid(trainer, resolution, bound=2.0)
            v_out, t_out = marching_cubes(-sig, 0.0)
            v_out = v_out / (resolution - 1.0) * 2 - 1
            v_out, t_out = meshops.remove_selected_verts(
                v_out, t_out, meshops.select_inside_box(0.5))
            half = 2.0 / resolution
            v_out = v_out * (2.0 - half)
            v_out, t_out = meshops.clean_mesh(
                v_out, t_out, min_f=cfg.clean_min_f, min_d=cfg.clean_min_d)
            if dec > 0 and len(t_out) > dec * 2:
                v_out, t_out = meshops.decimate_mesh(v_out, t_out, dec * 2)
            v_out = uncontract_np(v_out)
            aabb = trainer._aabb
            v_out, t_out = meshops.remove_selected_verts(
                v_out, t_out, meshops.select_outside_box(aabb))
            if len(t_out) > 0:
                write_ply(os.path.join(out_dir, "mesh_1.ply"), v_out, t_out)
                trainer.log(f"[INFO] exported mesh_1.ply: v={v_out.shape} f={t_out.shape}")
        else:
            for cas in range(1, cascades):
                bound = min(2 ** cas, rspec.grid_bound)
                half = bound / target_reso
                occ = grid_all[cas]
                # resize to env resolution (trilinear ~ repeat here)
                from scipy.ndimage import zoom
                occf = zoom(occ, target_reso / occ.shape[0], order=1)
                occf = np.nan_to_num(occf, 0.0)
                field = (occf > density_thresh).astype(np.float32)
                v_out, t_out = marching_cubes(field, 0.5)
                if len(t_out) == 0:
                    continue
                v_out = v_out / (target_reso - 1.0) * 2 - 1
                v_out, t_out = meshops.remove_selected_verts(
                    v_out, t_out, meshops.select_inside_box(0.45))
                if len(v_out) == 0:
                    continue
                v_out = v_out * (bound - half)
                aabb = trainer._aabb.copy()
                aabb[:3] += half
                aabb[3:] -= half
                v_out, t_out = meshops.remove_selected_verts(
                    v_out, t_out, meshops.select_outside_box(aabb))
                v_out, t_out = meshops.clean_mesh(
                    v_out, t_out, min_f=cfg.clean_min_f, min_d=cfg.clean_min_d)
                if len(t_out) == 0:
                    continue
                if dec > 0 and len(t_out) > dec:
                    v_out, t_out = meshops.decimate_mesh(v_out, t_out, dec)
                if dataset is not None and cfg.mesh_visibility_culling:
                    try:
                        vis_mask = mark_unseen_triangles(
                            v_out, t_out, dataset.mvps, dataset.H, dataset.W)
                        v_out, t_out = meshops.remove_masked_trigs(
                            v_out, t_out, vis_mask,
                            dilation=cfg.visibility_mask_dilation)
                    except ImportError:
                        pass
                write_ply(os.path.join(out_dir, f"mesh_{cas}.ply"), v_out, t_out)
                trainer.log(
                    f"[INFO] exported mesh_{cas}.ply: v={v_out.shape} f={t_out.shape}")
