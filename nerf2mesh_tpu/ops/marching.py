"""Occupancy-grid accelerated ray marching — TPU-native design.

Replaces the reference's per-ray sequential DDA CUDA kernels
(/root/reference/raymarching/src/raymarching.cu:332-489 ``kernel_march_rays_train``,
91-156 ``near_far_from_aabb``) with a *dense candidate + mask + static compaction*
formulation that maps onto XLA's static-shape, vector-parallel model:

  1. every ray generates its full dt-schedule of candidate sample positions in
     closed form (no data-dependent loop) — [N, K] with K = max_steps;
  2. one vectorized occupancy-grid gather masks the candidates (the cascaded
     mip / contraction logic of raymarching.cu:405-464 is applied pointwise);
  3. `jnp.nonzero(size=P)` compacts the surviving samples into a fixed-size
     point pool (P = cfg.num_points), in ray-major order — giving the same
     (offset, count) segment layout as the reference without the atomicAdd
     counter + host sync (raymarching.py:232) that the CUDA version needs.

The occupancy grid here is a plain row-major uint8 [CAS, H, H, H] array —
the Morton-order bitfield existed for CUDA cache behavior and is unnecessary
on TPU (SURVEY.md §7).
"""

from __future__ import annotations

import math
from functools import partial
from typing import NamedTuple, Optional

import jax
import jax.numpy as jnp

from .contraction import contract

SQRT3 = math.sqrt(3.0)


def near_far_from_aabb(rays_o, rays_d, aabb, min_near: float = 0.05):
    """Slab test (raymarching.cu:91-156). aabb: [6] = (xmin..zmax).

    Returns nears, fars [N]; rays that miss get near > far.
    """
    rd = jnp.where(jnp.abs(rays_d) < 1e-15, jnp.where(rays_d >= 0, 1e-15, -1e-15), rays_d)
    inv_d = 1.0 / rd
    t0 = (aabb[None, :3] - rays_o) * inv_d
    t1 = (aabb[None, 3:] - rays_o) * inv_d
    tmin = jnp.minimum(t0, t1).max(axis=-1)
    tmax = jnp.maximum(t0, t1).min(axis=-1)
    nears = jnp.maximum(tmin, min_near)
    fars = jnp.maximum(tmax, nears + 1e-6)
    # mark missed rays: far < near => no samples
    fars = jnp.where(tmax < nears, nears, fars)
    return nears, fars


def _dt_schedule(t0, steps: int, dt_gamma: float, dt_min: float, dt_max: float):
    """Closed-form cumulative t_i for the step recurrence
    t_{i+1} = t_i + clamp(t_i * dt_gamma, dt_min, dt_max)   (raymarching.cu:389,407)

    t0: [N] start values.  Returns ts [N, K] (t at the *start* of segment i) and
    dts [N, K].
    """
    i = jnp.arange(steps, dtype=jnp.float32)[None, :]          # [1, K]
    t0 = t0[:, None]                                            # [N, 1]
    if dt_gamma <= 0.0:
        ts = t0 + i * dt_min
        dts = jnp.full_like(ts, dt_min)
        return ts, dts

    g = dt_gamma
    # Phase boundaries in t: linear below a = dt_min/g, geometric up to
    # b = dt_max/g, then linear with dt_max.
    a = dt_min / g
    b = dt_max / g
    r = 1.0 + g

    # number of linear steps from t0 until t >= a (0 if t0 >= a)
    n1 = jnp.ceil(jnp.maximum(a - t0, 0.0) / dt_min)
    t_a = t0 + n1 * dt_min                                      # first geometric t
    # geometric phase: t_k = t_a * r^k, until t >= b
    n2 = jnp.ceil(
        jnp.maximum(jnp.log(jnp.maximum(b / jnp.maximum(t_a, 1e-12), 1.0)), 0.0)
        / math.log(r)
    )
    t_b = t_a * r ** n2

    # piecewise evaluation of t_i
    in1 = jnp.minimum(i, n1)
    in2 = jnp.clip(i - n1, 0.0, n2)
    in3 = jnp.maximum(i - n1 - n2, 0.0)
    ts = jnp.where(
        i <= n1,
        t0 + in1 * dt_min,
        jnp.where(i <= n1 + n2, t_a * r ** in2, t_b + in3 * dt_max),
    )
    dts = jnp.clip(ts * g, dt_min, dt_max)
    return ts, dts


def _occ_lookup(occ_grid, xyzs, dts, bound: float, contracted: bool,
                cascades: int, grid_size: int):
    """Pointwise occupancy test with cascade (mip) selection.

    occ_grid: [CAS, H, H, H] uint8/bool. xyzs: [..., 3] world positions
    (clamped to [-bound, bound]). dts: [...] step sizes.
    Returns (occ [...] bool, cxyz [..., 3] possibly contracted coords).
    """
    H = grid_size
    # mip from position: smallest cascade whose [-2^c, 2^c] box contains xyz
    # (raymarching.cu:42-48 mip_from_pos)
    mag = jnp.max(jnp.abs(xyzs), axis=-1)
    mip_pos = jnp.ceil(jnp.clip(jnp.log2(jnp.maximum(mag, 1e-12)), 0.0, None))
    # mip from dt: cascade whose voxel size (2*2^c/H) covers dt
    # (raymarching.cu:50-54 mip_from_dt)
    mip_dt = jnp.ceil(jnp.clip(jnp.log2(jnp.maximum(dts * H / 2.0, 1e-12)), 0.0, None))
    level = jnp.clip(jnp.maximum(mip_pos, mip_dt), 0, cascades - 1).astype(jnp.int32)

    mip_bound = jnp.minimum(2.0 ** level.astype(jnp.float32), bound)

    cxyz = xyzs
    is_out = mag > 1.0
    if contracted:
        cxyz = contract(xyzs)

    n = jnp.clip(
        (0.5 * (cxyz / mip_bound[..., None] + 1.0) * H).astype(jnp.int32), 0, H - 1
    )
    flat = ((level * H + n[..., 0]) * H + n[..., 1]) * H + n[..., 2]
    occ = jnp.take(occ_grid.reshape(-1), flat.reshape(-1), axis=0).reshape(flat.shape) > 0
    if contracted:
        # contracted out-of-unit-box points are always marched
        # (raymarching.cu:434-437)
        occ = occ | is_out
    return occ, cxyz


class MarchResult(NamedTuple):
    """Compacted point pool (ray-major order) — static shapes.

    All arrays have leading dim P = num_points; `valid` masks real samples.
    """
    xyzs: jax.Array       # [P, 3] sample positions (contracted coords if contract)
    dirs: jax.Array       # [P, 3] unnormalized ray directions
    ts: jax.Array         # [P] t at segment end (reference stores t_old + dt, raymarching.cu:436-446)
    dts: jax.Array        # [P]
    ray_idx: jax.Array    # [P] int32 ray id per sample
    valid: jax.Array      # [P] bool
    ray_offset: jax.Array  # [N] int32 segment start per ray (into the pool)
    ray_count: jax.Array   # [N] int32 samples per ray (post-truncation)
    total: jax.Array       # [] int32 number of valid samples


@partial(
    jax.jit,
    static_argnames=("num_points", "max_steps", "grid_size", "cascades",
                     "bound", "contracted", "dt_gamma", "perturb"),
)
def march_rays(
    rays_o,
    rays_d,
    occ_grid,
    nears,
    fars,
    *,
    num_points: int,
    max_steps: int = 1024,
    grid_size: int = 128,
    cascades: int = 1,
    bound: float = 1.0,
    contracted: bool = False,
    dt_gamma: float = 0.0,
    perturb: bool = False,
    noise_key: Optional[jax.Array] = None,
) -> MarchResult:
    """Static-shape training march (replaces march_rays_train).

    rays_o/d: [N, 3]; occ_grid: [CAS, H, H, H]; nears/fars: [N].
    """
    N = rays_o.shape[0]
    K = max_steps

    dt_min = 2.0 * SQRT3 / max_steps
    dt_max = 2.0 * SQRT3 * bound / grid_size

    t0 = nears
    if perturb and noise_key is not None:
        noise = jax.random.uniform(noise_key, (N,))
        t0 = t0 + jnp.clip(t0 * dt_gamma, dt_min, dt_max) * noise

    ts, dts = _dt_schedule(t0, K, dt_gamma, dt_min, dt_max)     # [N, K]

    # candidate sample positions at segment start (reference computes xyz at the
    # pre-advance t, raymarching.cu:396-399)
    xyzs = rays_o[:, None, :] + ts[..., None] * rays_d[:, None, :]
    xyzs = jnp.clip(xyzs, -bound, bound)

    occ, cxyz = _occ_lookup(occ_grid, xyzs, dts, bound, contracted, cascades, grid_size)

    keep = occ & (ts < fars[:, None])                            # [N, K]

    # compact in ray-major order into the fixed pool
    flat_keep = keep.reshape(-1)
    (pool_idx,) = jnp.nonzero(flat_keep, size=num_points, fill_value=N * K)
    valid = pool_idx < N * K
    safe_idx = jnp.where(valid, pool_idx, 0)

    ray_idx = (safe_idx // K).astype(jnp.int32)
    gather = lambda a: jnp.take(a.reshape(N * K, -1), safe_idx, axis=0)

    out_xyzs = gather(cxyz)                                      # [P, 3]
    out_ts = jnp.take(ts.reshape(-1), safe_idx) + jnp.take(dts.reshape(-1), safe_idx)
    out_dts = jnp.take(dts.reshape(-1), safe_idx)
    out_dirs = jnp.take(rays_d, ray_idx, axis=0)

    # per-ray segment layout
    counts_all = jnp.sum(keep, axis=1).astype(jnp.int32)         # pre-truncation
    starts = jnp.concatenate([jnp.zeros(1, jnp.int32), jnp.cumsum(counts_all)[:-1].astype(jnp.int32)])
    total = jnp.minimum(jnp.sum(counts_all), num_points)
    # post-truncation counts: clip segment to pool capacity
    seg_end = jnp.minimum(starts + counts_all, num_points)
    seg_start = jnp.minimum(starts, num_points)
    counts = (seg_end - seg_start).astype(jnp.int32)

    zero3 = jnp.zeros_like(out_xyzs)
    return MarchResult(
        xyzs=jnp.where(valid[:, None], out_xyzs, zero3),
        dirs=jnp.where(valid[:, None], out_dirs, zero3),
        ts=jnp.where(valid, out_ts, 0.0),
        dts=jnp.where(valid, out_dts, 0.0),
        ray_idx=jnp.where(valid, ray_idx, N - 1).astype(jnp.int32),
        valid=valid,
        ray_offset=seg_start.astype(jnp.int32),
        ray_count=counts,
        total=total.astype(jnp.int32),
    )
