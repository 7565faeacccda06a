"""Stage-0 volumetric renderer: occupancy-grid state + render functions.

Parity targets in the reference:
  * density grid state + EMA update:   nerf/renderer.py:110-118, 1074-1149
  * mark_untrained_grid:               nerf/renderer.py:985-1071
  * stage-0 training render:           nerf/renderer.py:676-813
  * NeuS sigma->alpha conversion:      nerf/renderer.py:724-739

TPU-native differences:
  * the density grid is a plain [CAS, H, H, H] float array and the "bitfield"
    is a uint8 occupancy array of the same layout (no Morton packing);
  * the per-step render is one pure jitted function: batch sampling, marching,
    field evaluation and compositing all run on device with static shapes;
  * grid updates are jitted whole-grid queries (the reference chunks by 128^3
    to fit CUDA memory; XLA pipelines the same computation).
"""

from __future__ import annotations

import math
from dataclasses import dataclass
from functools import partial
from typing import Any, Dict, NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ..ops.composite import composite_rays
from ..ops.sampling import near_far_from_aabb, sample_rays
from .network import (NetworkSpec, density, field_forward, finite_diff_normal,
                      rgb)
from ..data.rays import safe_normalize


@dataclass(frozen=True)
class RenderSpec:
    """Static geometry/render configuration (derived from Config)."""
    bound: float = 1.0            # real world bound
    contract: bool = False
    grid_size: int = 128
    min_near: float = 0.05
    density_thresh: float = 10.0
    max_steps: int = 1024         # sets dt_min = 2*sqrt(3)/max_steps
    num_coarse: int = 128         # coarse occupancy candidates per ray
    num_fine: int = 64            # field samples per ray (dense layout)
    dt_gamma: float = 0.0
    T_thresh: float = 1e-4
    sdf: bool = False

    @property
    def grid_bound(self) -> float:
        return 2.0 if self.contract else self.bound

    @property
    def cascades(self) -> int:
        gb = self.grid_bound
        return 1 + int(math.ceil(math.log2(gb))) if gb > 1 else 1


class RenderState(NamedTuple):
    """Mutable-across-steps occupancy state (a pytree, not params)."""
    density_grid: jax.Array   # [CAS, H, H, H] f32; -1 marks untrained cells
    occ_grid: jax.Array       # [CAS, H, H, H] uint8 thresholded occupancy
    mean_density: jax.Array   # [] f32
    iter_density: jax.Array   # [] int32


def init_render_state(spec: RenderSpec) -> RenderState:
    H, C = spec.grid_size, spec.cascades
    return RenderState(
        density_grid=jnp.zeros((C, H, H, H), jnp.float32),
        occ_grid=jnp.ones((C, H, H, H), jnp.uint8),   # dense until first update
        mean_density=jnp.zeros((), jnp.float32),
        iter_density=jnp.zeros((), jnp.int32),
    )


def grid_cell_centers(spec: RenderSpec) -> jax.Array:
    """[H^3, 3] cell-center coords in [-1, 1] (renderer.py:1099-1101)."""
    H = spec.grid_size
    ax = (2.0 * (jnp.arange(H, dtype=jnp.float32) + 0.0) / (H - 1)) - 1.0
    gx, gy, gz = jnp.meshgrid(ax, ax, ax, indexing="ij")
    return jnp.stack([gx, gy, gz], axis=-1).reshape(-1, 3)


GRID_UPDATE_SLABS = 8


def update_density_grid(
    params: Dict[str, Any],
    state: RenderState,
    key: jax.Array,
    spec: RenderSpec,
    net_spec: NetworkSpec,
    max_level: Optional[jax.Array] = None,
    decay: float = 0.95,
    slab: int = -1,
    trainable: bool = False,
    lambda_density: float = 0.0,
    grid_lr: float = 1e-2,
) -> RenderState:
    """Query density at jittered cell centers, EMA-max update, re-threshold
    occupancy (renderer.py:1074-1149).

    TPU twist: `slab` selects one of GRID_UPDATE_SLABS x-plane slabs to
    refresh (round-robin across calls); slab=-1 refreshes everything.  The
    reference re-queries all H^3*CAS cells every 16 steps; partial refresh
    amortizes that cost 8x with slightly stale occupancy (the same trade
    instant-NGP's official partial grid updates make).

    The slab index is a TRACED argument of one shared jit: a full refresh is
    GRID_UPDATE_SLABS executions of the same compiled program, not
    GRID_UPDATE_SLABS separate compiles (each step-sized compile costs tens
    of seconds on this backend).
    """
    if slab < 0:
        it0 = state.iter_density
        for s in range(GRID_UPDATE_SLABS):
            state = _update_density_slab(
                params, state, jax.random.fold_in(key, s), spec, net_spec,
                max_level, jnp.asarray(s, jnp.int32), decay=decay,
                trainable=trainable, lambda_density=lambda_density,
                grid_lr=grid_lr)
        # a full refresh is ONE logical grid update
        return state._replace(iter_density=it0 + 1)
    return _update_density_slab(
        params, state, key, spec, net_spec, max_level,
        jnp.asarray(slab, jnp.int32), decay=decay, trainable=trainable,
        lambda_density=lambda_density, grid_lr=grid_lr)


@partial(jax.jit, static_argnames=("spec", "net_spec", "decay",
                                   "trainable", "lambda_density", "grid_lr"))
def _update_density_slab(
    params: Dict[str, Any],
    state: RenderState,
    key: jax.Array,
    spec: RenderSpec,
    net_spec: NetworkSpec,
    max_level: Optional[jax.Array],
    slab: jax.Array,
    decay: float = 0.95,
    trainable: bool = False,
    lambda_density: float = 0.0,
    grid_lr: float = 1e-2,
) -> RenderState:
    """trainable=True is --trainable_density_grid (renderer.py:1123-1149): the
    grid descends an MSE-to-fresh-queries loss plus a cascaded mean-density
    regularizer instead of the EMA-max.  The reference adds that loss to the
    train objective and lets its Adam update the grid parameter; the gradient
    only touches the grid (queries are detached), so the equivalent here is a
    self-contained descent step on the analytic slab loss."""
    H, CAS = spec.grid_size, spec.cascades
    f32 = jnp.float32
    sh = H // GRID_UPDATE_SLABS
    x_lo = slab * sh
    HX = sh

    gi = jnp.arange(HX, dtype=f32) + x_lo.astype(f32)
    ax_x = 2.0 * gi / (H - 1) - 1.0
    ax = lambda lo, hi: 2.0 * jnp.arange(lo, hi, dtype=f32) / (H - 1) - 1.0
    gx, gy, gz = jnp.meshgrid(ax_x, ax(0, H), ax(0, H), indexing="ij")
    xyzs01 = jnp.stack([gx, gy, gz], axis=-1).reshape(-1, 3)   # [HX*H*H, 3]

    tmp = []
    keys = jax.random.split(key, CAS)
    for cas in range(CAS):
        bound = min(2 ** cas, spec.grid_bound)
        half = bound / H
        pts = xyzs01 * (bound - half)
        noise = jax.random.uniform(keys[cas], pts.shape, minval=-half, maxval=half)
        sig = density(params, pts + noise, net_spec, max_level)
        if spec.sdf:
            inv_s = jnp.clip(jnp.exp(params["variance"] * 10.0), 1e-6, 1e6)
            sig = jax.nn.sigmoid(-sig * inv_s) * inv_s
        tmp.append(sig.reshape(HX, H, H))
    tmp_slab = jnp.stack(tmp, axis=0)                      # [CAS, HX, H, H]

    old_slab = jax.lax.dynamic_slice_in_dim(state.density_grid, x_lo, HX, axis=1)
    valid = (old_slab >= 0) & (tmp_slab >= 0)
    if trainable:
        tgt = jax.lax.stop_gradient(tmp_slab)

        def slab_loss(g):
            nv = jnp.maximum(jnp.sum(valid), 1).astype(f32)
            loss = jnp.sum(jnp.where(valid, (g - tgt) ** 2, 0.0)) / nv
            for cas in range(1, CAS):
                nvc = jnp.maximum(jnp.sum(valid[cas]), 1).astype(f32)
                loss = loss + (2.0 ** (cas - 1)) * lambda_density * (
                    jnp.sum(jnp.where(valid[cas], g[cas], 0.0)) / nvc)
            return loss

        g = jax.grad(slab_loss)(old_slab)
        new_slab = jnp.where(valid, old_slab - grid_lr * g, old_slab)
    else:
        new_slab = jnp.where(
            valid, jnp.maximum(old_slab * decay, tmp_slab), old_slab)
    new_grid = jax.lax.dynamic_update_slice_in_dim(
        state.density_grid, new_slab, x_lo, axis=1)

    mean_density = jnp.mean(jnp.clip(new_grid, 0.0, None))
    thresh = jnp.minimum(mean_density, spec.density_thresh)
    occ = (new_grid > thresh).astype(jnp.uint8)
    return RenderState(
        density_grid=new_grid,
        occ_grid=occ,
        mean_density=mean_density,
        iter_density=state.iter_density + 1,
    )


def mark_untrained_grid(
    state: RenderState,
    poses: np.ndarray,          # [B, 4, 4] cam2world
    intrinsics,                 # (fx, fy, cx, cy)
    spec: RenderSpec,
    aabb: Optional[np.ndarray] = None,
    cam_near_far: Optional[np.ndarray] = None,
) -> RenderState:
    """Mark grid cells never seen by any training camera (or outside the AABB)
    with -1 so they stay unoccupied forever (renderer.py:985-1071).

    Host-side (runs once before training); vectorized numpy.
    """
    H, CAS = spec.grid_size, spec.cascades
    fx, fy, cx, cy = intrinsics
    poses = np.asarray(poses, np.float32)
    B = poses.shape[0]

    ax = 2.0 * np.arange(H, dtype=np.float32) / (H - 1) - 1.0
    gx, gy, gz = np.meshgrid(ax, ax, ax, indexing="ij")
    world = np.stack([gx, gy, gz], axis=-1).reshape(-1, 3)  # [N, 3] in [-1,1]

    if aabb is None:
        rb = spec.bound
        aabb = np.array([-rb, -rb, -rb, rb, rb, rb], np.float32)

    grid = np.asarray(state.density_grid).copy()
    for cas in range(CAS):
        bound = min(2 ** cas, spec.grid_bound)
        half = bound / H
        pts = world * (bound - half)                         # [N, 3]

        in_aabb = np.all(
            (pts >= aabb[:3] - half) & (pts <= aabb[3:] + half), axis=-1
        )

        seen = np.zeros(pts.shape[0], bool)
        S = 64
        for head in range(0, B, S):
            P = poses[head:head + S]
            cam = pts[None, :, :] - P[:, None, :3, 3]
            cam = np.einsum("bnc,bcr->bnr", cam, P[:, :3, :3])
            cam[:, :, 2] *= -1  # camera forward is -z (renderer.py:1044)
            min_near = (
                spec.min_near if cam_near_far is None
                else cam_near_far[head:head + S, 0:1]
            )
            mask_z = cam[:, :, 2] > min_near
            mask_x = np.abs(cam[:, :, 0]) < (cx / fx) * cam[:, :, 2] + half * 2
            mask_y = np.abs(cam[:, :, 1]) < (cy / fy) * cam[:, :, 2] + half * 2
            seen |= (mask_z & mask_x & mask_y).any(axis=0)

        untrained = (~seen) | (~in_aabb)
        g = grid[cas].reshape(-1)
        g[untrained] = -1.0
        grid[cas] = g.reshape(H, H, H)

    return state._replace(density_grid=jnp.asarray(grid))


def neus_alpha_from_sdf(
    sdf: jax.Array, normal: jax.Array, dirs: jax.Array, dts: jax.Array,
    inv_s: jax.Array, cos_anneal_ratio: jax.Array,
) -> jax.Array:
    """NeuS conversion: SDF + normal -> per-sample alpha (renderer.py:724-739)."""
    true_cos = jnp.sum(dirs * normal, axis=-1)
    iter_cos = -(
        jax.nn.relu(-true_cos * 0.5 + 0.5) * (1.0 - cos_anneal_ratio)
        + jax.nn.relu(-true_cos) * cos_anneal_ratio
    )
    est_prev = sdf - iter_cos * dts * 0.5
    est_next = sdf + iter_cos * dts * 0.5
    prev_cdf = jax.nn.sigmoid(est_prev * inv_s)
    next_cdf = jax.nn.sigmoid(est_next * inv_s)
    p = prev_cdf - next_cdf
    c = prev_cdf
    return jnp.clip((p + 1e-5) / (c + 1e-5), 0.0, 1.0)


def render_eval_segment(
    params: Dict[str, Any],
    occ_grid: jax.Array,
    rays_o: jax.Array,            # [N, 3]
    rays_d: jax.Array,            # [N, 3]
    nears: jax.Array,             # [N] segment start (advances across calls)
    fars: jax.Array,              # [N]
    sample_dt: jax.Array,         # [N] fixed sample spacing
    spec: RenderSpec,
    net_spec: NetworkSpec,
    *,
    shading: str = "full",
    ind_code: Optional[jax.Array] = None,
    pool_size: Optional[int] = None,
) -> Dict[str, jax.Array]:
    """One segment of the early-exit eval march (the TPU answer to the
    reference's alive-ray inference loop, renderer.py:749-802 /
    raymarching.cu:750-832).

    Places spec.num_fine samples at fixed spacing sample_dt from `nears`,
    composites them with transmittance starting at 1, and reports where the
    march stopped (`t_exit`).  The caller accumulates across segments
    (multiplicative transmittance) and drops finished rays between calls —
    host-side compaction replaces the CUDA kernel's in-place alive lists.
    No background compositing here; the caller owns it.

    pool_size: like render_train's — compact valid samples before the field
    evaluation; a lax.cond falls back to the dense path when the pool would
    overflow, so the output is always exact.
    """
    N = rays_o.shape[0]
    K = spec.num_fine
    m = sample_rays(
        rays_o, rays_d, occ_grid, nears, fars,
        num_coarse=spec.num_coarse, num_fine=K,
        grid_size=spec.grid_size, cascades=spec.cascades,
        bound=spec.bound, contracted=spec.contract, dt_gamma=spec.dt_gamma,
        max_steps=spec.max_steps, perturb=False, sample_dt=sample_dt,
    )
    pts = jax.lax.stop_gradient(m.xyzs.reshape(N * K, 3))
    dirs = safe_normalize(rays_d)
    dirs_flat = jnp.broadcast_to(dirs[:, None, :], (N, K, 3)).reshape(N * K, 3)
    if ind_code is not None and ind_code.shape[0] == N:
        ind_flat = jnp.broadcast_to(
            ind_code[:, None, :], (N, K, ind_code.shape[-1])).reshape(N * K, -1)
    else:
        ind_flat = ind_code

    full_flag = jnp.asarray(shading != "diffuse")

    def field_on(xs, ds_, inds):
        sig, rgb, _, _ = field_forward(
            params, xs, ds_, net_spec, full_flag, inds, None)
        if spec.sdf:
            inv_s = jnp.clip(jnp.exp(params["variance"] * 10.0), 1e-6, 1e6)
            normal = safe_normalize(
                finite_diff_normal(params, xs, net_spec, 1e-4, None))
            dtf = m.dts.reshape(-1) if xs.shape[0] == N * K else None
            # pooled sdf path gathers dts below; dense uses the flat dts
            sig = neus_alpha_from_sdf(
                sig, normal, ds_,
                dtf if dtf is not None else jnp.ones_like(sig) * 0.0,
                inv_s, jnp.asarray(1.0))
        return sig, rgb

    if pool_size is not None and int(pool_size) < N * K and not spec.sdf:
        P = int(pool_size)
        flat_valid = m.valid.reshape(-1)
        total = m.total

        def pooled(_):
            (ids,) = jnp.nonzero(flat_valid, size=P, fill_value=N * K)
            in_pool = jnp.arange(P) < total
            ids_c = jnp.minimum(ids, N * K - 1)
            sentinel = 3.0 * spec.bound
            x_pool = jnp.where(in_pool[:, None],
                               jnp.take(pts, ids_c, axis=0), sentinel)
            d_pool = jnp.take(dirs, ids_c // K, axis=0)
            i_pool = (jnp.take(ind_flat, ids_c, axis=0)
                      if (ind_flat is not None and ind_flat.ndim == 2
                          and ind_flat.shape[0] == N * K) else ind_flat)
            sig_p, rgb_p = field_on(x_pool, d_pool, i_pool)
            sig_p = jnp.where(in_pool, sig_p, 0.0)
            rgb_p = jnp.where(in_pool[:, None], rgb_p, 0.0)
            sig = jnp.zeros((N * K,)).at[ids].set(sig_p, mode="drop")
            rgb = jnp.zeros((N * K, 3)).at[ids].set(rgb_p, mode="drop")
            return sig, rgb

        def dense(_):
            return field_on(pts, dirs_flat, ind_flat)

        sigmas, rgbs = jax.lax.cond(total <= P, pooled, dense, None)
    else:
        sigmas, rgbs = field_on(pts, dirs_flat, ind_flat)

    out = composite_rays(
        sigmas.reshape(N, K), rgbs.reshape(N, K, 3), m.ts, m.dts, m.valid,
        T_thresh=spec.T_thresh, alpha_mode=spec.sdf,
    )
    return {
        "image": out["image"],                 # pre-background contribution
        "depth": out["depth"],
        "weights_sum": out["weights_sum"],     # 1 - T_end within the segment
        "t_exit": m.t_exit,
    }


def render_frame_queue(
    params: Dict[str, Any],
    occ_grid: jax.Array,
    rays_o: jax.Array,            # [N, 3] all rays of the frame (N >= chunk)
    rays_d: jax.Array,            # [N, 3]
    aabb: jax.Array,              # [6]
    spec: RenderSpec,             # spec.num_fine = samples per segment
    net_spec: NetworkSpec,
    *,
    chunk: int = 8192,
    shading: str = "full",
    pool_size: Optional[int] = None,
    eval_fine: int = 128,
) -> Dict[str, jax.Array]:
    """Whole-frame early-exit march in ONE device dispatch.

    The reference's inference loop (renderer.py:749-802) keeps a device-side
    alive-ray list and re-launches kernels per round from the host.  The
    first TPU rebuild compacted alive rays on the HOST between rounds, which
    costs one device->host sync per round — through the axon relay that is
    ~0.25 s each, dominating the 1.73 s/frame eval (PERF.md).  This version
    runs the whole loop inside `lax.while_loop`:

      * per-ray march state (accumulated rgb/depth, transmittance T, current
        t, alive flag) lives in dense [N] arrays on device;
      * each iteration compacts the alive rays with a stable argsort (alive
        first; 0.2 ms at 65k rays), takes the first `chunk`, marches them one
        `spec.num_fine`-sample segment (valid samples pool-compacted before
        the field evaluation, as in render_eval_segment), and scatters the
        accumulators back;
      * the loop exits when no ray is alive; a static safety bound caps
        iterations at ceil(N/chunk) * (2*max_steps/num_fine).

    Total field work matches the host-loop version (same chunking, same
    pool); the ~1 dispatch + 1 fetch per ROUND becomes 1 dispatch + 1 fetch
    per FRAME.  Returns pre-background image/depth/weights_sum like
    render_eval_segment; caller composites the background.
    """
    from ..ops.sampling import occupied_length

    n = rays_o.shape[0]
    K = spec.num_fine
    chunk = min(chunk, n)

    nears, fars = near_far_from_aabb(rays_o, rays_d, aabb, spec.min_near)
    olen = occupied_length(
        rays_o, rays_d, occ_grid, nears, fars,
        num_coarse=spec.num_coarse, grid_size=spec.grid_size,
        cascades=spec.cascades, bound=spec.bound, contracted=spec.contract,
        dt_gamma=spec.dt_gamma, max_steps=spec.max_steps)
    dt_min = 2.0 * math.sqrt(3.0) / spec.max_steps
    spacing = jnp.maximum(olen / eval_fine, dt_min).astype(jnp.float32)

    image0 = jnp.zeros((n, 3), jnp.float32)
    depth0 = jnp.zeros((n,), jnp.float32)
    T0 = jnp.ones((n,), jnp.float32)
    alive0 = olen > 0.0
    max_iters = -(-n // chunk) * max(2 * spec.max_steps // max(K, 1), 2)

    def cond(c):
        image, depth, T, tcur, alive, it = c
        return jnp.logical_and(jnp.any(alive), it < max_iters)

    def body(c):
        image, depth, T, tcur, alive, it = c
        # stable sort: alive rays first, original order preserved
        order = jnp.argsort(jnp.logical_not(alive))
        idx = jax.lax.dynamic_slice_in_dim(order, 0, chunk)
        a_sel = jnp.take(alive, idx)
        ro = jnp.take(rays_o, idx, axis=0)
        rd = jnp.take(rays_d, idx, axis=0)
        tc = jnp.where(a_sel, jnp.take(tcur, idx), 1.0)
        fr = jnp.where(a_sel, jnp.take(fars, idx), 0.0)  # dead: no samples
        sd = jnp.take(spacing, idx)
        seg = render_eval_segment(
            params, occ_grid, ro, rd, tc, fr, sd, spec, net_spec,
            shading=shading, pool_size=pool_size)
        Ti = jnp.take(T, idx)
        w = jnp.where(a_sel, Ti, 0.0)
        image = image.at[idx].add(w[:, None] * seg["image"])
        depth = depth.at[idx].add(w * seg["depth"])
        Tn = jnp.where(a_sel, Ti * (1.0 - seg["weights_sum"]), Ti)
        T = T.at[idx].set(Tn)
        tprev = jnp.take(tcur, idx)
        tn = jnp.where(a_sel, seg["t_exit"], tprev)
        tcur = tcur.at[idx].set(tn)
        alive_n = (a_sel & (Tn > spec.T_thresh)
                   & (tn <= jnp.take(fars, idx)) & (tn > tprev))
        alive = alive.at[idx].set(alive_n)
        return (image, depth, T, tcur, alive, it + 1)

    image, depth, T, _, _, iters = jax.lax.while_loop(
        cond, body, (image0, depth0, T0, nears, alive0, jnp.int32(0)))
    return {"image": image, "depth": depth, "weights_sum": 1.0 - T,
            "iters": iters}


def render_train(
    params: Dict[str, Any],
    occ_grid: jax.Array,
    rays_o: jax.Array,            # [N, 3]
    rays_d: jax.Array,            # [N, 3]
    bg_color: jax.Array,          # [N, 3] or [3]
    key: jax.Array,
    spec: RenderSpec,
    net_spec: NetworkSpec,
    *,
    shading: str = "full",
    full_flag: Optional[jax.Array] = None,   # traced diffuse/full switch
    perturb: bool = True,
    ind_code: Optional[jax.Array] = None,
    cam_near_far: Optional[jax.Array] = None,
    max_level: Optional[jax.Array] = None,
    cos_anneal_ratio: Optional[jax.Array] = None,
    normal_epsilon: float = 1e-4,
    aabb: Optional[jax.Array] = None,
    pool_size: Optional[int] = None,
) -> Dict[str, jax.Array]:
    """One training-mode volumetric render (renderer.py:676-748).

    Pure function; caller jits (usually as part of the train step).

    pool_size: when set, VALID samples are compacted into a fixed pool of
    that size before the field evaluation — the field (encoder + MLPs) then
    costs O(pool) instead of O(rays * samples), mirroring the reference's
    counted point buffer (raymarching.py:184-245) with static shapes.  On
    pool overflow, whole rays are dropped from the loss via `ray_kept` and
    `pool_overflow` reports the clipped sample count (loud, never silent).

    Returns image [N,3], depth [N], weights_sum [N], weights [N*K] (dense),
    valid [N*K] (dense), xyzs [P,3] + pp_valid [P] + speculars [P,3]
    (per-evaluated-point, pooled when pool_size is set), ray_kept [N],
    pool_overflow [], num_points [].
    """
    N = rays_o.shape[0]
    if aabb is None:
        rb = spec.bound
        aabb = jnp.asarray([-rb, -rb, -rb, rb, rb, rb])
    nears, fars = near_far_from_aabb(rays_o, rays_d, aabb, spec.min_near)
    if cam_near_far is not None:
        nears = jnp.maximum(nears, cam_near_far[:, 0])
        fars = jnp.minimum(fars, cam_near_far[:, 1])

    m = sample_rays(
        rays_o, rays_d, occ_grid, nears, fars,
        num_coarse=spec.num_coarse, num_fine=spec.num_fine,
        grid_size=spec.grid_size, cascades=spec.cascades,
        bound=spec.bound, contracted=spec.contract, dt_gamma=spec.dt_gamma,
        max_steps=spec.max_steps, perturb=perturb, noise_key=key,
    )
    K = spec.num_fine
    # sample positions are non-differentiable leaves (the reference's marched
    # xyzs have requires_grad=False, renderer.py:711); without stop_gradient
    # JAX would build dead-but-executed cotangent chains through the sampler
    # and the encoder's expensive d/dx path.
    pts = jax.lax.stop_gradient(m.xyzs.reshape(N * K, 3))

    dirs = safe_normalize(rays_d)                            # [N, 3]
    if full_flag is None:
        full_flag = jnp.asarray(shading != "diffuse")

    results: Dict[str, jax.Array] = {}
    car = cos_anneal_ratio if cos_anneal_ratio is not None else jnp.asarray(1.0)

    if pool_size is None:
        dirs_flat = jnp.broadcast_to(dirs[:, None, :], (N, K, 3)).reshape(N * K, 3)
        if ind_code is not None and ind_code.shape[0] == N:
            ind_flat = jnp.broadcast_to(
                ind_code[:, None, :], (N, K, ind_code.shape[-1])
            ).reshape(N * K, -1)
        else:
            ind_flat = ind_code

        sigmas, rgbs, speculars, enc_cnt = field_forward(
            params, pts, dirs_flat, net_spec, full_flag, ind_flat, max_level)

        if spec.sdf:
            inv_s = jnp.clip(jnp.exp(params["variance"] * 10.0), 1e-6, 1e6)
            raw_normal = finite_diff_normal(params, pts, net_spec,
                                            normal_epsilon, max_level)
            results["normal"] = raw_normal
            normal = safe_normalize(raw_normal)
            sigmas = neus_alpha_from_sdf(sigmas, normal, dirs_flat,
                                         m.dts.reshape(-1), inv_s, car)

        sig_nk = sigmas.reshape(N, K)
        rgb_nk = rgbs.reshape(N, K, 3)
        pp_xyz, pp_valid = pts, m.valid.reshape(-1)
        pp_spec = (speculars if speculars is not None
                   else jnp.zeros_like(rgbs)).reshape(N * K, 3)
        ray_kept = jnp.ones((N,), bool)
        pool_overflow = jnp.zeros((), jnp.int32)
    else:
        # ---- valid-sample pool compaction (reference raymarching.py:184-245)
        P = int(pool_size)
        flat_valid = m.valid.reshape(-1)                     # [N*K]
        total = m.total
        (ids,) = jnp.nonzero(flat_valid, size=P, fill_value=N * K)
        in_pool = jnp.arange(P) < total
        ids_c = jnp.minimum(ids, N * K - 1)

        sentinel = 3.0 * spec.bound                          # x01 -> 2.0 (oob)
        x_pool = jnp.take(pts, ids_c, axis=0)
        x_pool = jnp.where(in_pool[:, None], x_pool, sentinel)
        ray_ids = ids_c // K
        d_pool = jnp.take(dirs, ray_ids, axis=0)
        if ind_code is not None and ind_code.shape[0] == N:
            ind_pool = jnp.take(ind_code, ray_ids, axis=0)
        else:
            ind_pool = ind_code

        sigmas_p, rgbs_p, spec_p, enc_cnt = field_forward(
            params, x_pool, d_pool, net_spec, full_flag, ind_pool, max_level)

        if spec.sdf:
            inv_s = jnp.clip(jnp.exp(params["variance"] * 10.0), 1e-6, 1e6)
            raw_normal = finite_diff_normal(params, x_pool, net_spec,
                                            normal_epsilon, max_level)
            results["normal"] = raw_normal
            normal = safe_normalize(raw_normal)
            dt_pool = jnp.take(m.dts.reshape(-1), ids_c)
            sigmas_p = neus_alpha_from_sdf(sigmas_p, normal, d_pool,
                                           dt_pool, inv_s, car)

        sigmas_p = jnp.where(in_pool, sigmas_p, 0.0)
        rgbs_p = jnp.where(in_pool[:, None], rgbs_p, 0.0)
        sig_nk = jnp.zeros((N * K,)).at[ids].set(
            sigmas_p, mode="drop").reshape(N, K)
        rgb_nk = jnp.zeros((N * K, 3)).at[ids].set(
            rgbs_p, mode="drop").reshape(N, K, 3)

        # rays with valid samples that did NOT fit the pool leave the loss
        kept_slot = jnp.zeros((N * K,)).at[ids].set(1.0, mode="drop")
        dropped = flat_valid & (kept_slot == 0.0)
        ray_kept = ~jnp.any(dropped.reshape(N, K), axis=1)
        pool_overflow = jnp.maximum(total - P, 0)

        pp_xyz, pp_valid = x_pool, in_pool
        pp_spec = (spec_p if spec_p is not None
                   else jnp.zeros_like(rgbs_p))

    out = composite_rays(
        sig_nk, rgb_nk, m.ts, m.dts, m.valid,
        T_thresh=spec.T_thresh, alpha_mode=spec.sdf,
    )

    image = out["image"] + (1.0 - out["weights_sum"][:, None]) * bg_color
    results.update(
        image=image,
        depth=out["depth"],
        weights_sum=out["weights_sum"],
        weights=out["weights"].reshape(-1),
        xyzs=pp_xyz,
        valid=m.valid.reshape(-1),
        pp_valid=pp_valid,
        num_points=m.total,
        ray_kept=ray_kept,
        pool_overflow=pool_overflow,
        speculars=pp_spec,
        encode_resid=(enc_cnt if enc_cnt is not None
                      else jnp.zeros((net_spec.num_levels,), jnp.int32)),
    )
    return results
