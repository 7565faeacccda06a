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

    # LIVE weights, matching the reference: save_mesh marches the model's
    # current parameters (utils.py:892-960) — ema.copy_to() wraps only
    # eval/test steps (utils.py:1103-1112).  At convergence EMA ~= live, but
    # in short runs the 0.95-decay EMA lags ~20 steps and systematically
    # shifts the marched zero level-set (measured on the SDF e2e: live
    # frac_near 0.77 vs EMA 0.67 at 250 steps).
    params = trainer.state.params
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


def export_stage1_package(trainer, out_dir: str, h0: int = 2048,
                          w0: int = 2048) -> None:
    """Stage-1 web export (parity: reference renderer.py:297-468
    export_stage1): per cascade, unwrap UVs, bake diffuse + specular-feature
    textures by rasterizing in UV space and querying geo_feat at interpolated
    world positions, KNN-inpaint chart borders, write OBJ+MTL+jpgs, and dump
    the specular MLP to mlp.json (renderer.html-compatible)."""
    import json

    from PIL import Image
    from scipy.spatial import cKDTree

    from ..models.network import geo_feat
    from ..models.rasterizer import RasterSpec, interpolate, rasterize_crop
    from ..ops.contraction import contract_np
    from .io import write_obj
    from .uvatlas import unwrap_uv

    cfg = trainer.cfg
    nspec = trainer.net_spec
    params = trainer.state.params
    mesh = trainer.stage1_mesh
    os.makedirs(out_dir, exist_ok=True)

    ssaa = max(int(cfg.ssaa), 1)
    # offsets may be bucket-padded (trainer._reset_stage1_params); the real
    # vertices are the leading mesh.num_vertices rows
    v_all = mesh.vertices + np.asarray(
        params["vertices_offsets"])[:mesh.num_vertices]
    f_all = mesh.triangles
    cascades = len(mesh.v_cumsum) - 1

    @jax.jit
    def q_feat(pts):
        return geo_feat(params, pts, nspec)

    shell_k = max(int(getattr(cfg, "s1_shell", 1)), 1)
    if shell_k > 1:
        # bake with the SAME thin-shell composite the stage-1 train/eval
        # path uses (stage1.render_stage1_crop): single point samples alias
        # against the density ramp wherever vertex error exceeds the finest
        # hash cell.  At bake time there is no view ray; the shell runs
        # along the interpolated outward surface normal.
        from ..models.network import density

        @jax.jit
        def q_feat_shell(pts, nrms):
            n = nrms / jnp.maximum(
                jnp.linalg.norm(nrms, axis=-1, keepdims=True), 1e-9)
            K = shell_k
            offs = jnp.linspace(0.5 * cfg.s1_shell_h, -0.5 * cfg.s1_shell_h,
                                K)                      # outside -> inside
            dt = cfg.s1_shell_h / K
            P = pts.shape[0]

            # layer-wise scan: the exact-encode intermediate at P*K points
            # exceeds HBM (see stage1.render_stage1_crop)
            def _layer(carry, off):
                T, acc, wsum, acc_u = carry
                p = pts + off * n
                sig = density(params, p, nspec)
                gf = geo_feat(params, p, nspec)
                a = 1.0 - jnp.exp(-jnp.maximum(sig, 0.0) * dt)
                w = T * a
                acc = acc + w[:, None] * gf
                wsum = wsum + w
                T = T * (1.0 - a + 1e-7)
                acc_u = acc_u + gf * (1.0 / K)
                return (T, acc, wsum, acc_u), None

            F = 3 + nspec.specular_dim
            init = (jnp.ones((P,)), jnp.zeros((P, F)), jnp.zeros((P,)),
                    jnp.zeros((P, F)))
            (_, acc, wsum, acc_u), _ = jax.lax.scan(_layer, init, offs)
            wsum = wsum[:, None]
            mean_f = acc / jnp.maximum(wsum, 1e-6)
            return jnp.where(wsum > 0.05, mean_f, acc_u)

    cur_h, cur_w = h0, w0
    for cas in range(cascades):
        v = v_all[mesh.v_cumsum[cas]:mesh.v_cumsum[cas + 1]]
        f = f_all[mesh.f_cumsum[cas]:mesh.f_cumsum[cas + 1]] - mesh.v_cumsum[cas]

        uv_src = contract_np(v) if cfg.contract else v
        vmapping, ft, vt = unwrap_uv(uv_src, f)
        trainer.log(f"[INFO] unwrap cas {cas}: charts over v={len(v)} f={len(f)} "
                    f"-> uvv={len(vt)}")

        h, w = cur_h * ssaa, cur_w * ssaa
        # clip coords in uv space: x = u*2-1, row y = v*2-1 (w=1, z=0.5)
        clip = np.concatenate([
            vt[:, :1] * 2 - 1, vt[:, 1:2] * 2 - 1,
            np.full((len(vt), 1), 0.5, np.float32),
            np.ones((len(vt), 1), np.float32)], -1).astype(np.float32)
        world_attr = jnp.asarray(v[vmapping])           # [Nuv, 3]
        clip_j = jnp.asarray(clip)
        ft_j = jnp.asarray(ft.astype(np.int32))
        nrm_attr = None
        if shell_k > 1:
            fn = np.cross(v[f[:, 1]] - v[f[:, 0]], v[f[:, 2]] - v[f[:, 0]])
            vn = np.zeros_like(v)
            np.add.at(vn, f[:, 0], fn)
            np.add.at(vn, f[:, 1], fn)
            np.add.at(vn, f[:, 2], fn)
            vn /= np.maximum(np.linalg.norm(vn, axis=-1, keepdims=True),
                             1e-12)
            nrm_attr = jnp.asarray(vn[vmapping])        # [Nuv, 3]

        tile = 256
        spec = RasterSpec(
            crop=tile, frag=8,
            max_tris=1 << int(np.ceil(np.log2(max(len(ft), 2)))))
        feats = np.zeros((h, w, 6), np.float32)
        mask = np.zeros((h, w), bool)
        for y0 in range(0, h, tile):
            for x0 in range(0, w, tile):
                r = rasterize_crop(clip_j, ft_j, jnp.asarray([y0, x0]), h, w,
                                   spec)
                cov = np.asarray(r["covered"])
                if not cov.any():
                    continue
                xyz = interpolate(world_attr, r, ft_j)
                pts = np.asarray(xyz).reshape(-1, 3)
                if cfg.contract:
                    pts = contract_np(pts)
                if shell_k > 1:
                    nr = np.asarray(
                        interpolate(nrm_attr, r, ft_j)).reshape(-1, 3)
                    vals = np.asarray(
                        q_feat_shell(jnp.asarray(pts), jnp.asarray(nr)))
                else:
                    vals = np.asarray(q_feat(jnp.asarray(pts)))
                th = min(tile, h - y0); tw = min(tile, w - x0)
                feats[y0:y0+th, x0:x0+tw] = vals.reshape(tile, tile, -1)[:th, :tw, :6]
                mask[y0:y0+th, x0:x0+tw] = cov[:th, :tw]

        feats = (np.clip(feats, 0, 1) * 255).astype(np.uint8)

        # KNN inpaint around charts (renderer.py:378-394)
        if mask.any() and (~mask).any():
            from scipy.ndimage import binary_dilation, binary_erosion
            inpaint_region = binary_dilation(mask, iterations=32) & ~mask
            search_region = mask & ~binary_erosion(mask, iterations=3)
            s_coords = np.stack(np.nonzero(search_region), -1)
            i_coords = np.stack(np.nonzero(inpaint_region), -1)
            if len(s_coords) and len(i_coords):
                _, idx = cKDTree(s_coords).query(i_coords, k=1)
                feats[tuple(i_coords.T)] = feats[tuple(s_coords[idx].T)]

        f0 = Image.fromarray(feats[..., :3])
        f1 = Image.fromarray(feats[..., 3:6])
        if ssaa > 1:
            f0 = f0.resize((cur_w, cur_h), Image.BILINEAR)
            f1 = f1.resize((cur_w, cur_h), Image.BILINEAR)
        f0.save(os.path.join(out_dir, f"feat0_{cas}.jpg"), quality=95)
        f1.save(os.path.join(out_dir, f"feat1_{cas}.jpg"), quality=95)

        write_obj(os.path.join(out_dir, f"mesh_{cas}.obj"), v, f,
                  vts=vt, fts=ft, mtl_name=f"mesh_{cas}.mtl",
                  tex_name=f"feat0_{cas}.jpg")
        trainer.log(f"[INFO] wrote mesh_{cas}.obj + textures ({cur_w}x{cur_h})")

        if not cfg.sdf and cur_h > 2048 and cur_w > 2048:
            cur_h //= 2
            cur_w //= 2

    write_mlp_json(params["specular_net"], trainer.render_spec.grid_bound,
                   cascades, out_dir)
    trainer.log("[INFO] wrote mlp.json")


def write_mlp_json(specular_net, bound: float, cascades: int,
                   out_dir: str) -> str:
    """Specular MLP -> mlp.json (renderer.py:454-468).

    Contract (consumed by the reference renderer.html:200-202, 424-455):
    keys ``net.{l}.weight`` hold [in][out]-oriented weight lists (the
    reference dumps torch's [out,in] transposed, renderer.py:459); plus
    scalars ``bound`` and ``cascade``.  tests/test_export_contract.py
    emulates the reference GLSL pipeline against this file.
    """
    import json
    mlp = {}
    for l, layer in enumerate(specular_net):
        mlp[f"net.{l}.weight"] = np.asarray(layer["w"]).tolist()
    mlp["bound"] = bound
    mlp["cascade"] = cascades
    path = os.path.join(out_dir, "mlp.json")
    with open(path, "w") as fp:
        json.dump(mlp, fp, indent=2)
    return path


def mark_unseen_triangles(verts: np.ndarray, tris: np.ndarray,
                          mvps: np.ndarray, H: int, W: int,
                          frag_px: int = 8) -> np.ndarray:
    """Faces never rasterized by any camera (renderer.py:946-981).

    Uses the JAX rasterizer's triangle-id buffer per view.  Faces whose
    projected bbox exceeds the rasterizer's fragment block (frag_px) in any
    view are midpoint-subdivided first (child->parent mapped back): the
    fragment grid STRIDES over bigger bboxes and the skipped pixels would
    let occluded interior faces win — the round-2 capstone measured 35% of
    the exported mesh being interior junk kept alive by exactly those
    spurious "seen" seeds + selection dilation.
    Returns bool [M] mask, True = unseen.
    """
    from ..models.rasterizer import rasterize_trig_id
    from .meshops import midpoint_subdivide

    v = np.asarray(verts, np.float32)
    f = np.asarray(tris, np.int64)
    parent = np.arange(len(f))
    mvps = np.asarray(mvps, np.float32)

    def face_bbox_px(v, f):
        big = np.zeros(len(f), np.float32)
        vh = np.concatenate([v, np.ones_like(v[:, :1])], axis=1)
        for mvp in mvps:
            clip = vh @ mvp.T
            w = clip[:, 3]
            ok = w > 1e-6
            sx = np.where(ok, (clip[:, 0] / np.where(ok, w, 1)) * 0.5 * W, 0)
            sy = np.where(ok, (clip[:, 1] / np.where(ok, w, 1)) * 0.5 * H, 0)
            fx = sx[f]; fy = sy[f]
            ext = np.maximum(fx.max(1) - fx.min(1), fy.max(1) - fy.min(1))
            ext = np.where(ok[f].all(1), ext, 0.0)
            big = np.maximum(big, ext)
        return big

    for _ in range(6):
        split = face_bbox_px(v, f) > frag_px
        if not split.any():
            break
        v, f, par2 = midpoint_subdivide(v, f, split, return_parents=True)
        parent = parent[par2]

    seen = np.zeros(len(tris), bool)
    vj = jnp.asarray(v)
    tj = jnp.asarray(f)
    for mvp in mvps:
        tid = np.asarray(rasterize_trig_id(vj, tj, jnp.asarray(mvp), H, W))
        ids = np.unique(tid)
        ids = ids[ids >= 0]
        seen[parent[ids]] = True
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
        # (renderer.py:505-513).  Dilate the keep-mask by one grid cell:
        # slab-rotated updates sample boundary cells less often than the
        # reference's full refresh, and an unoccupied cell that the true
        # surface crosses would punch a HOLE in the marched mesh (measured:
        # holes let occluded interior junk become "visible" and survive the
        # visibility cull)
        grid = np.asarray(state.render.density_grid[0])
        keep = grid > density_thresh
        d = keep.copy()
        for ax in (0, 1, 2):
            d |= np.roll(keep, 1, ax) | np.roll(keep, -1, ax)
        reps = int(np.ceil(resolution / grid.shape[0]))
        mask = np.repeat(np.repeat(np.repeat(
            d, reps, 0), reps, 1), reps, 2)[:resolution, :resolution, :resolution]
        sigmas = sigmas * mask
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
                # grid_all may be a read-only jax-backed view; copy first
                # (nan_to_num's 2nd positional arg is `copy`, not `nan`).
                occ = np.nan_to_num(np.array(grid_all[cas], np.float32),
                                    nan=0.0)
                # The occupancy grid IS the source of truth for outer
                # cascades; upsampling a binarized copy past its native
                # resolution adds no information but multiplies the
                # staircase face count ~4x per octave, which made the
                # cascade-2 decimate pathologically slow (55-80 min/cascade
                # at env_reso=256 from a 128^3 grid).  Cap the MC reso at
                # the grid's native resolution and march the continuous
                # field directly (smoother + ~4x fewer faces).
                reso = min(target_reso, int(occ.shape[0]))
                bound = min(2 ** cas, rspec.grid_bound)
                half = bound / reso
                if reso != occ.shape[0]:
                    from scipy.ndimage import zoom
                    occf = np.nan_to_num(
                        zoom(occ, reso / occ.shape[0], order=1), nan=0.0)
                else:
                    occf = occ
                v_out, t_out = marching_cubes(occf, density_thresh)
                if len(t_out) == 0:
                    continue
                v_out = v_out / (reso - 1.0) * 2 - 1
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
