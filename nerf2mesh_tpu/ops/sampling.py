"""Occupancy-guided ray sampling — dense two-pass TPU formulation.

Why not the CUDA design: the reference marches each ray through the occupancy
bitfield step-by-step, writing a variable number of samples through an atomic
counter (raymarching.cu:332-489).  A faithful port would be gather/scatter
bound: on TPU, XLA lowers random gathers to ~9 ns/element scalar loops
(measured on v5e), so compacting pools and per-sample table walks are 100-1000x
slower than dense math.  This module replaces marching with a formulation whose
only irregular access is ONE coarse occupancy lookup per candidate:

  pass 1 (coarse): K_c candidates per ray on the closed-form dt schedule over
      [near, far]; a single vectorized occupancy-grid lookup marks occupied
      candidates (cascade/mip + contraction logic applied pointwise, matching
      raymarching.cu:405-464).
  pass 2 (fine):  K_f samples per ray placed by inverse-CDF over the occupied
      arc length.  The searchsorted/interp is computed with dense comparison
      tensors and einsum (MXU) — no gathers; every per-ray op lives in the
      lane dimension.

Compositing then runs on the dense [N, K_f] layout (see ops/composite.py).
Empty-space skipping becomes "empty space gets no samples", with sample count
per ray fixed — the same adaptive points-per-step contract as the reference
(utils.py:796-797) but with static shapes.
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
    """Slab test (raymarching.cu:91-156). aabb: [6]. Misses get near == far."""
    rd = jnp.where(jnp.abs(rays_d) < 1e-15,
                   jnp.where(rays_d >= 0, 1e-15, -1e-15), rays_d)
    inv_d = 1.0 / rd
    t0 = (aabb[None, :3] - rays_o) * inv_d
    t1 = (aabb[None, 3:] - rays_o) * inv_d
    tmin = jnp.minimum(t0, t1).max(axis=-1)
    tmax = jnp.maximum(t0, t1).min(axis=-1)
    nears = jnp.maximum(tmin, min_near)
    fars = jnp.maximum(tmax, nears)
    return nears, fars


def occupancy_lookup(occ_grid, xyzs, dts, bound: float, contracted: bool,
                     cascades: int, grid_size: int):
    """Pointwise occupancy test with cascade (mip) selection
    (raymarching.cu:42-54 mip_from_pos/mip_from_dt, 405-464).

    occ_grid: [CAS, H, H, H]; xyzs: [..., 3]; dts: [...].
    Returns (occ bool [...], cxyz [..., 3] contracted coords).
    """
    H = grid_size
    mag = jnp.max(jnp.abs(xyzs), axis=-1)
    mip_pos = jnp.ceil(jnp.clip(jnp.log2(jnp.maximum(mag, 1e-12)), 0.0, None))
    mip_dt = jnp.ceil(jnp.clip(jnp.log2(jnp.maximum(dts * H / 2.0, 1e-12)), 0.0, None))
    level = jnp.clip(jnp.maximum(mip_pos, mip_dt), 0, cascades - 1).astype(jnp.int32)
    mip_bound = jnp.minimum(2.0 ** level.astype(jnp.float32), bound)

    cxyz = contract(xyzs) if contracted else xyzs
    n = jnp.clip((0.5 * (cxyz / mip_bound[..., None] + 1.0) * H).astype(jnp.int32),
                 0, H - 1)
    flat = ((level * H + n[..., 0]) * H + n[..., 1]) * H + n[..., 2]
    import os
    from .occ_sweep import occ_lookup_sweep, pack_bits, sweep_supported
    if (os.environ.get("NERF2MESH_OCC_SWEEP", "1") != "0"
            and sweep_supported(cascades, H)
            and jax.default_backend() not in ("cpu",)):
        # bit-packed VMEM sweep: ~2 vector ops/sample instead of a serial
        # HBM gather (the cost that scales with rays * coarse candidates)
        occ = occ_lookup_sweep(pack_bits(occ_grid), flat) > 0
    else:
        occ = jnp.take(occ_grid.reshape(-1), flat.reshape(-1),
                       axis=0).reshape(flat.shape) > 0
    if contracted:
        occ = occ | (mag > 1.0)   # contracted outer region always marched
    return occ, cxyz


def _dt_schedule(t0, steps: int, dt_gamma: float, dt_min: float, dt_max: float):
    """Closed-form t_i for t_{i+1} = t_i + clamp(t_i*dt_gamma, dt_min, dt_max)
    (raymarching.cu:389,407): linear below dt_min/g, geometric, then linear."""
    i = jnp.arange(steps, dtype=jnp.float32)[None, :]
    t0 = t0[:, None]
    if dt_gamma <= 0.0:
        ts = t0 + i * dt_min
        return ts, jnp.full_like(ts, dt_min)
    g = dt_gamma
    a, b, r = dt_min / g, dt_max / g, 1.0 + g
    n1 = jnp.ceil(jnp.maximum(a - t0, 0.0) / dt_min)
    t_a = t0 + n1 * dt_min
    n2 = jnp.ceil(jnp.maximum(
        jnp.log(jnp.maximum(b / jnp.maximum(t_a, 1e-12), 1.0)), 0.0) / math.log(r))
    t_b = t_a * r ** n2
    in2 = jnp.clip(i - n1, 0.0, n2)
    in3 = jnp.maximum(i - n1 - n2, 0.0)
    ts = jnp.where(i <= n1, t0 + jnp.minimum(i, n1) * dt_min,
                   jnp.where(i <= n1 + n2, t_a * r ** in2, t_b + in3 * dt_max))
    return ts, jnp.clip(ts * g, dt_min, dt_max)


@partial(jax.jit, static_argnames=(
    "num_coarse", "grid_size", "cascades", "bound", "contracted",
    "dt_gamma", "max_steps"))
def occupied_length(
    rays_o, rays_d, occ_grid, nears, fars, *,
    num_coarse: int = 128, grid_size: int = 128, cascades: int = 1,
    bound: float = 1.0, contracted: bool = False, dt_gamma: float = 0.0,
    max_steps: int = 1024,
) -> jax.Array:
    """[N] total occupied length along each ray (coarse pass only, no field
    queries) — sets the fixed sample spacing for the early-exit eval march."""
    f32 = jnp.float32
    dt_min = 2.0 * SQRT3 / max_steps
    dt_max = 2.0 * SQRT3 * bound / grid_size
    span = jnp.maximum(fars - nears, 1e-9)
    ts_sched, _ = _dt_schedule(nears, num_coarse + 1, dt_gamma, dt_min, dt_max)
    reach = ts_sched[:, -1] - nears
    scale = jnp.maximum(span / jnp.maximum(reach, 1e-9), 1.0)
    edges = nears[:, None] + (ts_sched - nears[:, None]) * scale[:, None]
    t0c = edges[:, :-1]
    dtc = edges[:, 1:] - edges[:, :-1]
    tmidc = t0c + 0.5 * dtc
    xyz_c = rays_o[:, None, :] + tmidc[..., None] * rays_d[:, None, :]
    xyz_c = jnp.clip(xyz_c, -bound, bound)
    occ, _ = occupancy_lookup(occ_grid, xyz_c, dtc, bound, contracted,
                              cascades, grid_size)
    occ = occ & (t0c < fars[:, None])
    return jnp.sum(jnp.where(occ, dtc, 0.0), axis=-1).astype(f32)


class Samples(NamedTuple):
    """Dense per-ray samples, [N, K] layout."""
    ts: jax.Array      # [N, K] segment midpoint t
    dts: jax.Array     # [N, K] segment length
    xyzs: jax.Array    # [N, K, 3] world (or contracted) positions
    valid: jax.Array   # [N, K] bool — ray had occupied space here
    total: jax.Array   # [] int32 number of valid samples (for adaptive rays)
    t_exit: Optional[jax.Array] = None  # [N] segment-mode: t where the march
    #                                     consumed its budget (next near)


@partial(jax.jit, static_argnames=(
    "num_coarse", "num_fine", "grid_size", "cascades", "bound", "contracted",
    "dt_gamma", "max_steps", "perturb"))
def sample_rays(
    rays_o, rays_d, occ_grid, nears, fars, *,
    num_coarse: int = 128,
    num_fine: int = 64,
    grid_size: int = 128,
    cascades: int = 1,
    bound: float = 1.0,
    contracted: bool = False,
    dt_gamma: float = 0.0,
    max_steps: int = 1024,
    perturb: bool = False,
    noise_key: Optional[jax.Array] = None,
    sample_dt: Optional[jax.Array] = None,
) -> Samples:
    """Two-pass occupancy-importance sampling. rays_o/d: [N, 3].

    sample_dt [N] (segment mode, for the early-exit eval loop): instead of
    stretching Kf samples over the whole occupied length, place them at fixed
    per-ray spacing sample_dt starting at `nears`, consuming at most
    Kf*sample_dt of occupied length; `t_exit` then reports where the march
    stopped (the next segment's near).  This makes a sequence of segment
    calls equivalent to one long fixed-spacing march (the reference's
    march_rays inference loop, raymarching.cu:750-832).
    """
    N = rays_o.shape[0]
    Kc, Kf = num_coarse, num_fine
    f32 = jnp.float32

    dt_min = 2.0 * SQRT3 / max_steps
    dt_max = 2.0 * SQRT3 * bound / grid_size

    # ---- pass 1: coarse candidates on the dt schedule, stretched to cover
    # [near, far] with Kc segments (schedule gives minimum spacing; if the ray
    # span exceeds the schedule's reach we scale spacing up uniformly).
    span = jnp.maximum(fars - nears, 1e-9)                    # [N]
    ts_sched, _ = _dt_schedule(nears, Kc + 1, dt_gamma, dt_min, dt_max)
    reach = ts_sched[:, -1] - nears                           # [N]
    scale = jnp.maximum(span / jnp.maximum(reach, 1e-9), 1.0)  # >= 1
    edges = nears[:, None] + (ts_sched - nears[:, None]) * scale[:, None]  # [N, Kc+1]
    t0c = edges[:, :-1]
    dtc = edges[:, 1:] - edges[:, :-1]                        # [N, Kc]
    tmidc = t0c + 0.5 * dtc

    xyz_c = rays_o[:, None, :] + tmidc[..., None] * rays_d[:, None, :]
    xyz_c = jnp.clip(xyz_c, -bound, bound)
    occ, _ = occupancy_lookup(occ_grid, xyz_c, dtc, bound, contracted,
                              cascades, grid_size)
    occ = occ & (t0c < fars[:, None])                          # [N, Kc]

    # ---- pass 2: inverse-CDF placement of Kf samples over occupied length
    occ_len = jnp.where(occ, dtc, 0.0)                        # [N, Kc]
    cdf = jnp.cumsum(occ_len, axis=-1)                        # [N, Kc]
    total_len = cdf[:, -1:]                                   # [N, 1]
    has_any = total_len[:, 0] > 0

    if perturb and noise_key is not None:
        u = jax.random.uniform(noise_key, (N, Kf))
    else:
        u = jnp.full((N, Kf), 0.5)
    if sample_dt is None:
        s = (jnp.arange(Kf, dtype=f32)[None, :] + u) / Kf * total_len  # [N, Kf]
    else:
        sd = sample_dt[:, None].astype(f32)                        # [N, 1]
        s = (jnp.arange(Kf, dtype=f32)[None, :] + u) * sd          # [N, Kf]

    # dense searchsorted: one-hot over coarse segments, then gather-free
    # per-sample segment properties via einsum (rides the MXU).
    cdf0 = jnp.concatenate([jnp.zeros((N, 1), f32), cdf[:, :-1]], axis=-1)
    chosen = (cdf[:, None, :] >= s[:, :, None]) & (cdf0[:, None, :] < s[:, :, None])
    oh = chosen.astype(f32)                                    # [N, Kf, Kc]

    # HIGHEST: these einsums SELECT t-values via a one-hot; the TPU's default
    # bf16 matmul would quantize the selected t0/cdf to ~2^-9 relative —
    # ~0.004-0.008 world units of noise on every sample position at t~2,
    # the measured magnitude of the stage-0 surface noise.
    hi = jax.lax.Precision.HIGHEST
    seg_t0 = jnp.einsum("nfc,nc->nf", oh, t0c, precision=hi)
    seg_dt = jnp.einsum("nfc,nc->nf", oh, dtc, precision=hi)   # == occupied length of chosen seg
    seg_cdf0 = jnp.einsum("nfc,nc->nf", oh, cdf0, precision=hi)
    picked = jnp.sum(oh, axis=-1) > 0                          # [N, Kf]

    frac = jnp.where(seg_dt > 0, (s - seg_cdf0) / jnp.maximum(seg_dt, 1e-12), 0.0)
    ts = seg_t0 + frac * seg_dt                                # [N, Kf]
    if sample_dt is None:
        dts = total_len / Kf                                   # [N, 1] world-length per sample
        dts = jnp.broadcast_to(dts, (N, Kf))
    else:
        dts = jnp.broadcast_to(sd, (N, Kf))

    valid = picked & has_any[:, None] & (ts < fars[:, None])
    if sample_dt is not None:
        valid = valid & (s < total_len)                        # budget inside occ

    t_exit = None
    if sample_dt is not None:
        # t where cumulative occupied length reaches the consumed budget
        consumed = jnp.minimum(Kf * sd[:, 0], total_len[:, 0])  # [N]
        ch = ((cdf >= consumed[:, None]) &
              (cdf0 < consumed[:, None])).astype(f32)           # [N, Kc]
        e_t0 = jnp.einsum("nc,nc->n", ch, t0c,
                          precision=jax.lax.Precision.HIGHEST)
        e_cdf0 = jnp.einsum("nc,nc->n", ch, cdf0,
                            precision=jax.lax.Precision.HIGHEST)
        exhausted = Kf * sd[:, 0] >= total_len[:, 0]
        t_exit = e_t0 + (consumed - e_cdf0)
        # budget exhausted the remaining occupied space -> ray is done
        t_exit = jnp.where(exhausted | ~has_any, fars + 1.0, t_exit)

    xyz = rays_o[:, None, :] + ts[..., None] * rays_d[:, None, :]
    xyz = jnp.clip(xyz, -bound, bound)
    if contracted:
        xyz = contract(xyz)

    return Samples(
        ts=jnp.where(valid, ts, 0.0),
        dts=jnp.where(valid, dts, 0.0),
        xyzs=jnp.where(valid[..., None], xyz, 0.0),
        valid=valid,
        total=jnp.sum(valid).astype(jnp.int32),
        t_exit=t_exit,
    )
