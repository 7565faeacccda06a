"""Differentiable triangle rasterizer — TPU-native (replaces nvdiffrast).

Parity target: the reference's stage-1 path uses nvdiffrast's
rasterize/interpolate/antialias (renderer.py:860-887) on full frames.  A
faithful z-buffer port would be scatter/gather bound; this design keeps the
irregular work small and static:

  * training renders a random CROP (the loss is per-pixel, so crops are an
    unbiased patch estimator — they also serve the LPIPS patch loss directly);
  * triangles overlapping the crop are compacted to a fixed budget K, each
    rasterizing a fixed 8x8-superpixel fragment block over its bbox (meshes
    are pre-subdivided so screen bboxes fit — see `subdivide_for_raster`);
  * depth resolve is a scatter-min; the unique winner per pixel is selected
    with a second scatter-min over fragment ids;
  * barycentrics (perspective-correct) and depth are recomputed per winning
    fragment differentiably — XLA autodiff gives d(pixel)/d(clip verts),
    matching nvdiffrast's rasterize+interpolate gradient flow;
  * coverage is a *soft* silhouette alpha (signed-distance sigmoid over ~1px):
    its gradient w.r.t. vertex positions plays the role of dr.antialias's
    edge gradients (pos_gradient_boost scales it, renderer.py:886-887).

Coordinate conventions follow the reference MVP (provider.py:265-276):
clip = mvp @ [v, 1]; screen x = (ndc.x+1)/2*W, row y = (ndc.y+1)/2*H
(the projection's y-flip is already in the matrix); depth = ndc z.
"""

from __future__ import annotations

import math
from dataclasses import dataclass
from functools import partial
from typing import Dict, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np


@dataclass(frozen=True)
class RasterSpec:
    crop: int = 128            # crop side in pixels (static)
    max_tris: int = 8192       # triangle budget per crop after compaction
    frag: int = 8              # fragment block side: frag x frag superpixels
    soft_px: float = float(np.sqrt(2.0))  # softness radius of edge alpha (px)
    # live-fragment budget: pixel scatters run on this many compacted rows
    # (~crop^2 x expected depth complexity; overflow is counted loudly)
    max_frags: int = 1 << 20


def transform_clip(verts: jax.Array, mvp: jax.Array) -> jax.Array:
    """[V, 3] world -> [V, 4] clip (renderer.py:858).

    precision=HIGHEST: the TPU's default bf16 matmul quantizes clip coords to
    ~2^-9 relative — ±0.3 px of per-vertex screen wobble that antialiased
    silhouettes cannot survive (the stage-1 rim band).  A [V,4]x[4,4] matmul
    at fp32 is negligible."""
    v1 = jnp.concatenate([verts, jnp.ones_like(verts[:, :1])], axis=-1)
    return jnp.einsum("vk,ck->vc", v1, mvp,
                      precision=jax.lax.Precision.HIGHEST)


@partial(jax.jit, static_argnames=("H", "W", "spec"))
def rasterize_crop(
    verts_clip: jax.Array,      # [V, 4]
    tris: jax.Array,            # [F, 3] int32
    crop_origin: jax.Array,     # [2] (y0, x0) in pixels, traced
    H: int, W: int,
    spec: RasterSpec = RasterSpec(),
    f_valid: Optional[jax.Array] = None,  # traced count: faces >= f_valid
                                          # are padding and never rasterize
) -> Dict[str, jax.Array]:
    """Rasterize the [crop x crop] window at crop_origin.

    Returns dict with, per crop pixel:
      tri_id [C, C] int32 (-1 = empty), bary [C, C, 3] perspective-correct,
      depth [C, C] ndc z, alpha [C, C] soft coverage, zw [C, C] clip-w.
    bary/depth/alpha are differentiable w.r.t. verts_clip.

    f_valid supports bucket-padded meshes (trainer pads V/F to size buckets
    so stage-1 refines reuse the compiled step instead of re-jitting on
    every topology change): pad triangles are masked out of the overlap
    compaction, so they consume no K slots and paint nothing.
    """
    Cp = spec.crop
    K = spec.max_tris
    B = spec.frag
    F = tris.shape[0]
    f32 = jnp.float32

    w = verts_clip[:, 3]
    safe_w = jnp.where(jnp.abs(w) < 1e-9, 1e-9, w)
    ndc = verts_clip[:, :3] / safe_w[:, None]
    sx = (ndc[:, 0] + 1.0) * 0.5 * W
    sy = (ndc[:, 1] + 1.0) * 0.5 * H
    sz = ndc[:, 2]
    inv_w = 1.0 / safe_w

    y0 = crop_origin[0].astype(f32)
    x0 = crop_origin[1].astype(f32)

    # --- triangle setup (dense over all F)
    t = tris
    tx = jnp.stack([sx[t[:, 0]], sx[t[:, 1]], sx[t[:, 2]]], -1)  # [F, 3]
    ty = jnp.stack([sy[t[:, 0]], sy[t[:, 1]], sy[t[:, 2]]], -1)
    tw = jnp.stack([w[t[:, 0]], w[t[:, 1]], w[t[:, 2]]], -1)

    xmin = tx.min(-1); xmax = tx.max(-1)
    ymin = ty.min(-1); ymax = ty.max(-1)
    in_front = jnp.all(tw > 1e-6, axis=-1)
    overlaps = (
        in_front
        & (xmax >= x0) & (xmin < x0 + Cp)
        & (ymax >= y0) & (ymin < y0 + Cp)
    )
    if f_valid is not None:
        overlaps = overlaps & (jnp.arange(F) < f_valid)

    # --- compact overlapping triangles to K slots (ray-major order).
    # Triangles past the K budget are DROPPED — report the count loudly
    # (`overflow` output) so callers can assert/warn instead of rendering
    # holes silently (round-1 failure mode: 4.2M tris vs K=131k).
    n_overlap = jnp.sum(overlaps.astype(jnp.int32))
    overflow = jnp.maximum(n_overlap - K, 0)
    (slot_idx,) = jnp.nonzero(overlaps, size=K, fill_value=F)
    valid_tri = slot_idx < F
    sid = jnp.where(valid_tri, slot_idx, 0)

    def g(a):
        return jnp.take(a, sid, axis=0)

    ktx, kty, ktw = g(tx), g(ty), g(tw)                          # [K, 3]
    ktz = g(jnp.stack([sz[t[:, 0]], sz[t[:, 1]], sz[t[:, 2]]], -1))
    kxmin, kymin = g(xmin), g(ymin)
    kxmax, kymax = g(xmax), g(ymax)

    # --- fragment generation: B x B superpixel block over each tri bbox
    # stride 1px when bbox fits in B, else strided (subdivision should keep
    # bboxes <= B for exactness; strided sampling degrades gracefully).
    bx0 = jnp.clip(jnp.floor(kxmin - x0), 0, Cp - 1)
    by0 = jnp.clip(jnp.floor(kymin - y0), 0, Cp - 1)
    bx1 = jnp.clip(jnp.ceil(kxmax - x0), 1, Cp)
    by1 = jnp.clip(jnp.ceil(kymax - y0), 1, Cp)
    stx = jnp.maximum((bx1 - bx0) / B, 1.0)                      # [K]
    sty = jnp.maximum((by1 - by0) / B, 1.0)

    ii = jnp.arange(B, dtype=f32)
    fx = bx0[:, None] + (ii[None, :] + 0.0) * stx[:, None]        # [K, B]
    fy = by0[:, None] + (ii[None, :] + 0.0) * sty[:, None]
    px = jnp.floor(fx)                                            # crop pixel col
    py = jnp.floor(fy)

    # pixel centers in full-screen coords: [K, B, B]
    cx = (x0 + px[:, None, :]) + 0.5                              # [K, 1, B] -> bcast
    cy = (y0 + py[:, :, None]) + 0.5                              # [K, B, 1]
    cx = jnp.broadcast_to(cx, (K, B, B))
    cy = jnp.broadcast_to(cy, (K, B, B))

    # edge functions / screen barycentrics
    x1, x2, x3 = ktx[:, 0, None, None], ktx[:, 1, None, None], ktx[:, 2, None, None]
    y1, y2, y3 = kty[:, 0, None, None], kty[:, 1, None, None], kty[:, 2, None, None]
    det = (x2 - x1) * (y3 - y1) - (x3 - x1) * (y2 - y1)           # [K,1,1]
    # sign-preserving clamp: a tiny NEGATIVE det must not flip every
    # barycentric's sign (the old where() clamped to +1e-12)
    det_safe = jnp.where(det < 0, -1.0, 1.0) * jnp.maximum(
        jnp.abs(det), 1e-12)
    l1 = ((x2 - cx) * (y3 - cy) - (x3 - cx) * (y2 - cy)) / det_safe
    l2 = ((x3 - cx) * (y1 - cy) - (x1 - cx) * (y3 - cy)) / det_safe
    l3 = 1.0 - l1 - l2                                            # [K, B, B]

    # signed distance to the nearest edge (screen px) for soft coverage:
    # lambda_i scaled by the corresponding altitude length.
    def edge_dist(l, xa, ya, xb, yb):
        # eps inside the sqrt: degenerate (zero-length) edges otherwise give
        # NaN gradients through d(sqrt)/dx at 0
        elen = jnp.sqrt((xb - xa) ** 2 + (yb - ya) ** 2 + 1e-12)
        return l * jnp.abs(det_safe) / elen                        # ~ px distance

    d1 = edge_dist(l1, x2, y2, x3, y3)
    d2 = edge_dist(l2, x3, y3, x1, y1)
    d3 = edge_dist(l3, x1, y1, x2, y2)
    sdist = jnp.minimum(jnp.minimum(d1, d2), d3)                   # >0 inside
    alpha = jax.nn.sigmoid(sdist * (4.0 / spec.soft_px))           # [K, B, B]

    # Edge-on faces (silhouettes, occlusion boundaries) project to
    # near-DEGENERATE slivers: sdist ~ 0 along their entire projected
    # segment, so without care they paint half-opaque streaks ("hairs")
    # outside silhouettes and win depth with extrapolated barycentrics
    # (speckle).  True coverage of a degenerate projection is ~0: fade
    # alpha by the projected inradius (A/s = |det|/perimeter).
    perim = (jnp.sqrt((x2 - x1) ** 2 + (y2 - y1) ** 2 + 1e-12)
             + jnp.sqrt((x3 - x2) ** 2 + (y3 - y2) ** 2 + 1e-12)
             + jnp.sqrt((x1 - x3) ** 2 + (y1 - y3) ** 2 + 1e-12))
    r_in = jnp.abs(det) / jnp.maximum(perim, 1e-12)                # [K,1,1] px
    sliver_fade = jnp.clip(r_in / (0.25 * spec.soft_px), 0.0, 1.0)
    alpha = alpha * sliver_fade
    degen = jax.lax.stop_gradient(r_in) < 0.02                     # [K,1,1]

    # exact half-plane inside test (stable for slivers, where the
    # edge-distance form can report sdist ~ +0 along the degenerate line)
    strict_in = (jax.lax.stop_gradient(l1) >= 0.0) \
        & (jax.lax.stop_gradient(l2) >= 0.0) \
        & (jax.lax.stop_gradient(l3) >= 0.0)

    # rasterize the near-edge band too: 0.7072 = half the pixel diagonal, so
    # every pixel whose SQUARE overlaps the triangle is live (sdist is the
    # min edge-LINE distance, which under-estimates region distance near
    # corners — conservative).  Required for exact `area` coverage: corner
    # overlaps with centers past the old 0.5 band carried up to ~0.02 area.
    inside = sdist > -0.7072
    in_crop = (px[:, None, :] >= 0) & (px[:, None, :] < Cp) & \
              (py[:, :, None] >= 0) & (py[:, :, None] < Cp)
    in_crop = jnp.broadcast_to(in_crop, (K, B, B))
    live = inside & in_crop & valid_tri[:, None, None]

    # perspective-correct barycentrics + depth
    iw1, iw2, iw3 = (1.0 / ktw[:, 0, None, None], 1.0 / ktw[:, 1, None, None],
                     1.0 / ktw[:, 2, None, None])
    denom = l1 * iw1 + l2 * iw2 + l3 * iw3
    denom = jnp.where(jnp.abs(denom) < 1e-12, 1e-12, denom)
    b1 = l1 * iw1 / denom
    b2 = l2 * iw2 / denom
    b3 = 1.0 - b1 - b2
    z1, z2, z3 = ktz[:, 0, None, None], ktz[:, 1, None, None], ktz[:, 2, None, None]
    depth = l1 * z1 + l2 * z2 + l3 * z3     # ndc z is screen-linear

    # --- resolve: scatter-min depth, then unique winner by fragment id
    pix = (py[:, :, None] * Cp + px[:, None, :]).astype(jnp.int32)
    pix = jnp.broadcast_to(pix, (K, B, B))
    pix_flat = jnp.where(live, pix, Cp * Cp).reshape(-1)           # dump slot

    NP = Cp * Cp + 1
    depth_det = jax.lax.stop_gradient(depth).reshape(-1)
    depth_det = jnp.where(live.reshape(-1), depth_det, jnp.inf)

    # depth-winner selection prefers STRICTLY-INSIDE fragments (exact
    # half-plane tests): near-edge outside fragments carry extrapolated
    # barycentrics and would query the field off-surface — they may only
    # win pixels no inside fragment covers (silhouette rims).  ndc z spans
    # ~[-1,1], so +4 pushes all outside fragments behind every inside one;
    # degenerate projections (+8) only ever win as a last resort, and their
    # alpha is faded to ~0 anyway.
    outside = ~jnp.broadcast_to(strict_in, (K, B, B)).reshape(-1)
    degen_f = jnp.broadcast_to(degen, (K, B, B)).reshape(-1)
    depth_key = depth_det + jnp.where(outside, 4.0, 0.0) \
        + jnp.where(degen_f, 8.0, 0.0)
    depth_key = jnp.where(live.reshape(-1), depth_key, jnp.inf)

    # --- live-fragment compaction.  Only a small fraction of the dense
    # [K, B, B] fragment grid is live (past-budget slots, out-of-bbox and
    # outside-triangle samples are dead — ~6% at capstone scale), but HBM
    # scatters pay per ROW (~0.1 G rows/s, PERF.md).  Compact live fragment
    # ids once (a sort — 0.4 G elem/s), then run every pixel scatter on P
    # rows instead of K*B*B.  Dropped-on-overflow fragments are counted.
    NF = K * B * B
    P = min(spec.max_frags, NF)
    live_flat = live.reshape(-1)
    frag_iota = jnp.arange(NF, dtype=jnp.int32)
    lid_sorted = jax.lax.sort(jnp.where(live_flat, frag_iota, NF))
    lid_raw = jax.lax.slice_in_dim(lid_sorted, 0, P)
    valid_f = lid_raw < NF
    lid = jnp.where(valid_f, lid_raw, 0)
    n_live = jnp.sum(live_flat.astype(jnp.int32))
    frag_overflow = jnp.maximum(n_live - P, 0)

    pixc = jnp.where(valid_f, jnp.take(pix_flat, lid), Cp * Cp)
    keyc = jnp.where(valid_f, jnp.take(depth_key, lid), jnp.inf)

    zmin = jnp.full((NP,), jnp.inf, f32).at[pixc].min(keyc)
    frag_wins = keyc <= (jnp.take(zmin, pixc) + 1e-9)

    cand = jnp.where(frag_wins & valid_f, lid, NF)
    win_id = jnp.full((NP,), NF, jnp.int32).at[pixc].min(cand)

    # winner fields by GATHER on win_id (16k rows) — NOT a scatter-add over
    # all fragments.  Gradient flows through the take; its backward is a
    # 16k-row scatter into the fragment field.
    covered_flat = win_id[:-1] < NF
    win_safe = jnp.where(covered_flat, win_id[:-1], 0)

    def resolve(field):
        out = jnp.take(field.reshape(-1), win_safe)
        return jnp.where(covered_flat, out, 0.0).reshape(Cp, Cp)

    out_tri = jnp.where(
        covered_flat, jnp.take(sid, win_safe // (B * B)), -1).reshape(Cp, Cp)
    covered = covered_flat.reshape(Cp, Cp)

    # --- exact per-fragment pixel coverage (for alpha_mode="area").
    # Round-3 diagnosed the stage-1 deficit to silhouette coverage; the
    # round-4 oracle probe (workspace/ab/oracle_probe.py) showed the bias is
    # in the ESTIMATOR: with vertices projected exactly onto the analytic
    # surface, strict+AA coverage still under-reads the rim by ~0.09 alpha,
    # because the AA edge-crossing truncates at the depth-winner's edge while
    # the surface continues through heavily-foreshortened rim slivers.  The
    # exact area of (triangle ∩ pixel square) has no such truncation: rim
    # slivers contribute exactly their microscopic areas, front faces tile
    # partitions of the pixel, and the union over the front surface is a sum.
    #
    # Per-edge closed form (convex polygon ∩ axis-aligned box):
    #   area = Σ_edges ∫_{y∈pixel} clamp(x_edge(y) - X0, 0, 1) · dy(signed)
    # (the inner clamp integrates the covered x-interval per y-slab; the
    # signed directed-edge sum telescopes exactly like the shoelace formula).
    # ~80 flops per fragment, no polygon buffers, a.e. differentiable in the
    # screen vertices — a DENSE analytic silhouette gradient at every rim
    # fragment, vs the AA pass's sparse pairwise crossings.
    def _edge_area(xa_, ya_, xb_, yb_):
        # signed ∫ clamp(x - X0, 0, 1) dy along edge (xa,ya)->(xb,yb),
        # y-clipped to the pixel row [Y0, Y0+1]
        X0 = x0 + jnp.broadcast_to(px[:, None, :], (K, B, B))
        Y0 = y0 + jnp.broadcast_to(py[:, :, None], (K, B, B))
        uy1 = ya_ - Y0
        uy2 = yb_ - Y0
        dy = uy2 - uy1
        dy_safe = jnp.where(jnp.abs(dy) < 1e-12, 1e-12, dy)
        t_at0 = (0.0 - uy1) / dy_safe
        t_at1 = (1.0 - uy1) / dy_safe
        t0 = jnp.clip(jnp.where(dy > 0, t_at0, t_at1), 0.0, 1.0)
        t1 = jnp.clip(jnp.where(dy > 0, t_at1, t_at0), 0.0, 1.0)
        t1 = jnp.maximum(t1, t0)
        xu = xa_ + t0 * (xb_ - xa_) - X0
        xv = xa_ + t1 * (xb_ - xa_) - X0
        sy = (uy1 + t1 * dy) - (uy1 + t0 * dy)   # signed y-span actually swept

        def G(u, v):
            # mean of max(lerp(u, v, s), 0) over s in [0, 1]
            du = u - v
            du_safe = jnp.where(jnp.abs(du) < 1e-8, 1.0, du)
            exact = (jnp.maximum(u, 0.0) ** 2 - jnp.maximum(v, 0.0) ** 2) \
                / (2.0 * du_safe)
            return jnp.where(jnp.abs(du) < 1e-8,
                             jnp.maximum(0.5 * (u + v), 0.0), exact)

        return sy * (G(xu, xv) - G(xu - 1.0, xv - 1.0))

    xr1 = jnp.broadcast_to(x1, (K, B, B))
    yr1 = jnp.broadcast_to(y1, (K, B, B))
    xr2 = jnp.broadcast_to(x2, (K, B, B))
    yr2 = jnp.broadcast_to(y2, (K, B, B))
    xr3 = jnp.broadcast_to(x3, (K, B, B))
    yr3 = jnp.broadcast_to(y3, (K, B, B))
    frag_area = (_edge_area(xr1, yr1, xr2, yr2)
                 + _edge_area(xr2, yr2, xr3, yr3)
                 + _edge_area(xr3, yr3, xr1, yr1))   # signed by winding

    # coverage alpha: max over ALL live fragments (not just the depth winner),
    # so interior tri-tri edges stay opaque; only true silhouettes go soft.
    # A pixel center strictly inside ANY triangle is interior to the mesh
    # surface, not near its silhouette — force it opaque.  Without this,
    # sub-pixel triangles (dense stage-1 meshes) cap every interior pixel's
    # per-triangle edge distance near 0 and the whole surface renders
    # half-transparent.  Soft (differentiable) alpha remains exactly on
    # silhouette pixels outside all triangles, which is where nvdiffrast's
    # antialias propagates vertex gradients too (renderer.py:884-887).
    # Both ride the compacted fragment list: one packed W=2 gather + two
    # P-row scatter-maxes.
    # union-coverage support: screen barycentrics are affine in the pixel
    # position, so each compacted fragment carries (l1, l2) at its pixel
    # center plus the 4 gradient coefficients and can evaluate exact
    # half-plane inside tests at ANY subsample offset in-register.
    sg = jax.lax.stop_gradient
    g1x = jnp.broadcast_to((y2 - y3) / det_safe, (K, B, B))
    g1y = jnp.broadcast_to((x3 - x2) / det_safe, (K, B, B))
    g2x = jnp.broadcast_to((y3 - y1) / det_safe, (K, B, B))
    g2y = jnp.broadcast_to((x1 - x3) / det_safe, (K, B, B))
    packed = jnp.stack(
        [alpha.reshape(-1),
         (jnp.broadcast_to(strict_in & ~degen, (K, B, B))
          .reshape(-1)).astype(f32),
         frag_area.reshape(-1),
         sg(l1).reshape(-1), sg(l2).reshape(-1),
         sg(g1x).reshape(-1), sg(g1y).reshape(-1),
         sg(g2x).reshape(-1), sg(g2y).reshape(-1),
         jnp.broadcast_to(degen, (K, B, B)).reshape(-1).astype(f32),
         ], axis=-1)                                             # [NF, 10]
    pc = jnp.take(packed, lid, axis=0) * valid_f[:, None].astype(f32)
    alpha_img = jnp.zeros((NP,), f32).at[pixc].max(pc[:, 0])[:-1]
    covered_strict = jnp.zeros((NP,), f32).at[pixc].max(
        jax.lax.stop_gradient(pc[:, 1]))[:-1]
    alpha_img = jnp.maximum(alpha_img, covered_strict)

    # --- subsample-UNION coverage (overlap-immune silhouette value).
    # The exact-area SUM assumes the front surface tiles each pixel once;
    # real stage-1 meshes (marching cubes on a learned field + decimate/
    # refine churn + snap/projection) self-overlap at the rim, and the sum
    # double-counts each folded layer (round-4 oracle-v2 probe: area read
    # cov 0.95 where the true union was 0.48).  A 4x4 subsample half-plane
    # test per fragment, scatter-MAXed per channel (max == OR on {0,1}),
    # is a true union at 1/16 quantization — immune to folds, backfaces
    # counted like GT alpha counts any surface.  Value-only (stop-grad):
    # the analytic area remains the dense silhouette GRADIENT carrier.
    su = (jnp.arange(4, dtype=f32) + 0.5) / 4.0 - 0.5            # [-.375..]
    sux = jnp.tile(su, 4)[None, :]                               # [1, 16]
    suy = jnp.repeat(su, 4)[None, :]
    l1s = pc[:, 3:4] + pc[:, 5:6] * sux + pc[:, 6:7] * suy       # [P, 16]
    l2s = pc[:, 4:5] + pc[:, 7:8] * sux + pc[:, 8:9] * suy
    l3s = 1.0 - l1s - l2s
    m16 = ((l1s >= 0.0) & (l2s >= 0.0) & (l3s >= 0.0)
           & (pc[:, 9:10] < 0.5) & valid_f[:, None]).astype(f32)
    union16 = jnp.zeros((NP, 16), f32).at[pixc].max(m16)[:-1]
    union16_img = jnp.mean(union16, axis=-1)

    # exact-area union coverage: front-surface fragments tile each pixel, so
    # their areas SUM (clamped; self-occlusion overlap only saturates).  The
    # facing filter is the signed winding itself: depth winners are front
    # faces by construction, so the majority sign of their screen determinant
    # identifies the front orientation; back faces then carry the opposite
    # sign and clamp away at 0 (a closed surface's rim back-slivers would
    # otherwise double the silhouette band's area).
    det_k = jax.lax.stop_gradient(det_safe[:, 0, 0])             # [K]
    det_win = jnp.take(det_k, win_safe // (B * B))
    vote = jnp.sum(jnp.where(covered_flat, jnp.sign(det_win), 0.0))
    facing = jnp.where(vote >= 0.0, 1.0, -1.0)
    area_c = jnp.maximum(pc[:, 2] * facing, 0.0)
    area_img = jnp.zeros((NP,), f32).at[pixc].add(area_c)[:-1]
    area_img = jnp.clip(area_img, 0.0, 1.0)

    win_slot = jnp.where(covered_flat, win_safe // (B * B),
                         -1).astype(jnp.int32).reshape(Cp, Cp)

    return {
        "tri_id": out_tri,
        "bary": jnp.stack([resolve(b1), resolve(b2), resolve(b3)], axis=-1),
        "depth": resolve(depth),
        "alpha": jnp.clip(alpha_img.reshape(Cp, Cp), 0.0, 1.0),
        # exact area-SUM coverage of the front surface per pixel — dense
        # analytic d(coverage)/d(screen verts) at every rim fragment, but
        # double-counts self-overlapping (folded) layers
        "area": area_img.reshape(Cp, Cp),
        # 4x4-subsample true UNION coverage (overlap-immune, value-only;
        # alpha_mode="area" composites stop_grad(union - area) + area)
        "union": union16_img.reshape(Cp, Cp),
        "covered": covered,
        # strict pixel-center coverage: some triangle contains the pixel
        # center (exact half-plane test, degenerate slivers excluded).  This
        # is the TRUE binary coverage; `covered` additionally includes
        # near-edge outside winners (extrapolated rim pixels) and is ~1px
        # dilated at every silhouette.
        "strict": covered_strict.reshape(Cp, Cp) > 0.5,
        # winner triangle K-slot per pixel (-1 empty) + per-slot screen
        # coords: inputs to `antialias`.
        "win_slot": win_slot,
        "tri_sx": ktx,
        "tri_sy": kty,
        "overflow": overflow + frag_overflow,
        # live-fragment count (pre-budget): sizes max_frags from data
        # instead of the per-face estimate (stage-1 step attribution)
        "n_live": n_live,
        "n_overlap": n_overlap,
    }


def _aa_pairs(rgba: jax.Array, slot: jax.Array, strict: jax.Array,
              depth: jax.Array, tsx: jax.Array, tsy: jax.Array,
              y0, x0, depth_eps: float) -> jax.Array:
    """Antialias deltas for horizontally adjacent pixel pairs.

    rgba [H, W, 4]; slot [H, W] int32; strict [H, W] bool; depth [H, W];
    tsx/tsy [K, 3] screen coords per triangle slot (differentiable).
    Returns a delta image [H, W, 4] to ADD to rgba.
    """
    Hc, Wc = slot.shape
    f32 = jnp.float32

    sl_p, sl_q = slot[:, :-1], slot[:, 1:]
    st_p, st_q = strict[:, :-1], strict[:, 1:]
    d_p, d_q = depth[:, :-1], depth[:, 1:]

    # silhouette pair: strict coverage flips, or both strict with different
    # winners across a real depth gap (occlusion boundary).  nvdiffrast
    # restricts to silhouette edges via topology; the depth gap is the
    # behavioral analog.
    both = st_p & st_q & (sl_p != sl_q) & (jnp.abs(d_p - d_q) > depth_eps)
    fg_p = (st_p & ~st_q) | (both & (d_p <= d_q))
    fg_q = (st_q & ~st_p) | (both & (d_q < d_p))
    active = fg_p | fg_q

    fgslot = jnp.where(fg_p, sl_p, sl_q)
    safe = jnp.maximum(fgslot, 0).reshape(-1)
    xs = jnp.take(tsx, safe, axis=0).reshape(Hc, Wc - 1, 3)
    ys = jnp.take(tsy, safe, axis=0).reshape(Hc, Wc - 1, 3)

    cy = y0 + jnp.arange(Hc, dtype=f32)[:, None] + 0.5           # [H, 1]
    cxp = x0 + jnp.arange(Wc - 1, dtype=f32)[None, :] + 0.5      # [1, W-1]

    # where does the fg triangle's boundary cross the segment between the
    # two pixel centers (the horizontal line y=cy, x in [cxp, cxp+1])?
    ya = ys - cy[..., None]                                      # [H, W-1, 3]
    yb = jnp.roll(ya, -1, axis=-1)
    xa, xb = xs, jnp.roll(xs, -1, axis=-1)
    crossing = (ya * yb) < 0.0
    denom = ya - yb
    denom = jnp.where(jnp.abs(denom) < 1e-12, 1e-12, denom)
    t = ya / denom
    xc = xa + t * (xb - xa)                                      # [H, W-1, 3]
    in_seg = crossing & (xc >= cxp[..., None]) & (xc <= cxp[..., None] + 1.0)

    # fg contains its own pixel center, so moving toward the other pixel we
    # EXIT through the first crossing: min xc when fg is the left pixel,
    # max xc when fg is the right pixel.
    xc_min = jnp.min(jnp.where(in_seg, xc, jnp.inf), axis=-1)
    xc_max = jnp.max(jnp.where(in_seg, xc, -jnp.inf), axis=-1)
    has = jnp.any(in_seg, axis=-1)
    xc_sel = jnp.where(fg_p, xc_min, xc_max)
    u = jnp.clip(xc_sel - cxp, 0.0, 1.0)
    cov = jnp.where(fg_p, u, 1.0 - u)          # fg coverage of the 1px span
    valid = active & has
    cov = jnp.where(valid, cov, 0.5)           # 0.5 -> zero delta

    f = jnp.where(fg_p[..., None], rgba[:, :-1], rgba[:, 1:])
    g = jnp.where(fg_p[..., None], rgba[:, 1:], rgba[:, :-1])
    w_other = jnp.maximum(cov - 0.5, 0.0)[..., None]
    w_fg = jnp.maximum(0.5 - cov, 0.0)[..., None]
    delta_fg = w_fg * (g - f)                  # fg loses coverage
    delta_other = w_other * (f - g)            # fg bleeds into the neighbor
    dp = jnp.where(fg_p[..., None], delta_fg, delta_other)
    dq = jnp.where(fg_p[..., None], delta_other, delta_fg)

    out = jnp.zeros_like(rgba)
    out = out.at[:, :-1].add(dp)
    out = out.at[:, 1:].add(dq)
    return out


def antialias(rgba: jax.Array, rast: Dict[str, jax.Array],
              crop_origin: jax.Array, depth_eps: float = 0.02) -> jax.Array:
    """Analytic edge antialiasing (dr.antialias analog, renderer.py:884-887).

    For every horizontally/vertically adjacent pixel pair whose strict
    coverage flips (silhouette vs background) or whose winners differ across
    a depth gap (occlusion boundary), find where the nearer triangle's edge
    crosses the segment between the two pixel centers and blend the pair by
    the exact 1-D coverage.  The blend weight is differentiable w.r.t. the
    edge's two screen-space vertices — this is THE gradient channel that
    trains stage-1 vertex offsets, exactly as in nvdiffrast (the reference
    detaches xyzs before the field query unless enable_offset_nerf_grad,
    renderer.py:877-879, so antialias carries all photometric vertex signal).

    rgba: [C, C, 4] composited image+alpha at the rast resolution.
    """
    y0 = crop_origin[0].astype(jnp.float32)
    x0 = crop_origin[1].astype(jnp.float32)
    slot, strict, depth = rast["win_slot"], rast["strict"], rast["depth"]
    tsx, tsy = rast["tri_sx"], rast["tri_sy"]
    dh = _aa_pairs(rgba, slot, strict, depth, tsx, tsy, y0, x0, depth_eps)
    # vertical pairs = horizontal pairs of the transposed image with the
    # roles of x and y swapped
    dv = _aa_pairs(rgba.transpose(1, 0, 2), slot.T, strict.T, depth.T,
                   tsy, tsx, x0, y0, depth_eps).transpose(1, 0, 2)
    return rgba + dh + dv


def interpolate(attrs: jax.Array, rast: Dict[str, jax.Array],
                tris: jax.Array) -> jax.Array:
    """Per-pixel attribute interpolation (dr.interpolate analog).

    attrs: [V, C]; uses the crop's tri_id + perspective-correct barycentrics.
    Differentiable w.r.t. attrs and (through bary) the clip vertices.
    """
    tri_id = rast["tri_id"]
    safe_id = jnp.maximum(tri_id, 0)
    corner = jnp.take(tris, safe_id.reshape(-1), axis=0)           # [P, 3]
    a = jnp.take(attrs, corner.reshape(-1), axis=0).reshape(
        corner.shape[0], 3, -1)                                     # [P, 3, C]
    b = rast["bary"].reshape(-1, 3)
    # HIGHEST: bf16 inputs would round interpolated world positions (and the
    # barycentrics themselves) to ~2^-9 — half a finest-hash-cell of noise on
    # every field sample the rasterizer feeds (see transform_clip).
    out = jnp.einsum("pkc,pk->pc", a, b,
                     precision=jax.lax.Precision.HIGHEST)
    out = jnp.where(rast["covered"].reshape(-1, 1), out, 0.0)
    return out.reshape(*tri_id.shape, -1)


def rasterize_trig_id(verts: jax.Array, tris: jax.Array, mvp: jax.Array,
                      H: int, W: int, crop: int = 256,
                      face_chunk: int = 1 << 18) -> jax.Array:
    """Full-frame triangle-id buffer by looping crops (visibility culling,
    renderer.py:946-981). Host loop; returns [H, W] int32, -1 empty.

    Meshes bigger than `face_chunk` are rasterized in face chunks with a
    host-side z-merge (winner = global min depth across chunks) — sizing
    the compaction budget to the full face count OOMs HBM past ~2^19 faces
    (the dense [K, 8, 8] fragment tensors scale with K)."""
    clip = transform_clip(verts, mvp)
    F = int(tris.shape[0])
    K = 1 << int(np.ceil(np.log2(max(min(F, face_chunk), 2))))
    spec = RasterSpec(crop=crop, max_tris=K)
    out = np.full((H, W), -1, np.int32)
    best = np.full((H, W), np.inf, np.float32)
    for f0 in range(0, F, face_chunk):
        sub = jax.lax.slice_in_dim(tris, f0, min(f0 + face_chunk, F))
        for y0 in range(0, H, crop):
            for x0 in range(0, W, crop):
                r = rasterize_crop(clip, sub, jnp.asarray([y0, x0]), H, W,
                                   spec)
                tile = np.asarray(r["tri_id"])
                d = np.asarray(r["depth"])
                cov = tile >= 0
                d = np.where(cov, d, np.inf)
                h = min(crop, H - y0); wdt = min(crop, W - x0)
                win = d[:h, :wdt] < best[y0:y0 + h, x0:x0 + wdt]
                sel = win & cov[:h, :wdt]
                region = out[y0:y0 + h, x0:x0 + wdt]
                region[sel] = tile[:h, :wdt][sel] + f0
                best[y0:y0 + h, x0:x0 + wdt][win] = d[:h, :wdt][win]
    return out


def subdivide_for_raster(verts: np.ndarray, tris: np.ndarray,
                         max_edge: float,
                         max_faces: int = 0) -> Tuple[np.ndarray, np.ndarray]:
    """Host-side preprocessing: midpoint-subdivide triangles until no edge
    exceeds max_edge (world units), bounding projected bbox size so each
    triangle fits its fragment block.

    max_faces > 0 is a hard face budget (keep the mesh within the raster
    compaction budget K — round 1 measured a 42x face explosion silently
    overflowing K): when splitting everything would bust the budget, only the
    largest faces are split, largest-first, and the loop stops at the budget.
    """
    from ..meshing.meshops import midpoint_subdivide
    verts = np.asarray(verts, np.float32)
    tris = np.asarray(tris, np.int64)
    for _ in range(16):
        e = np.stack([
            np.linalg.norm(verts[tris[:, 0]] - verts[tris[:, 1]], axis=-1),
            np.linalg.norm(verts[tris[:, 1]] - verts[tris[:, 2]], axis=-1),
            np.linalg.norm(verts[tris[:, 2]] - verts[tris[:, 0]], axis=-1),
        ], -1).max(-1)
        big = e > max_edge
        n_big = int(big.sum())
        if n_big == 0:
            break
        if max_faces > 0:
            # a 1->4 split adds 3 faces (edge-neighbor bisection adds ~1 more;
            # the budget check next round catches any overshoot)
            n_budget = max(max_faces - len(tris), 0) // 3
            if n_budget == 0:
                print(f"[subdivide_for_raster] face budget {max_faces} "
                      f"reached with {n_big} faces still over max_edge="
                      f"{max_edge:.4g}; stopping (strided fragment blocks "
                      f"cover the remainder)")
                break
            if n_big > n_budget:
                order = np.argsort(-e)[:n_budget]
                big = np.zeros(len(tris), bool)
                big[order] = True
        verts, tris = midpoint_subdivide(verts, tris, big)
        tris = tris.astype(np.int64)
    return verts.astype(np.float32), tris.astype(np.int32)
