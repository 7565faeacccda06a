"""Geometry-path matmul precision guards.

On TPU, the default f32 matmul/einsum rounds its INPUTS to bfloat16 (8-bit
mantissa).  For the geometry pipeline that is catastrophic and invisible to
CPU tests (CPU matmuls are full f32): measured on chip, `get_rays`
directions were quantized to exact multiples of 2^-9 — up to 0.26 px of
view-dependent warp at 256^2 — and the stage-1 clip transform wobbled
vertices by ±0.3 px, the round-2 "±0.005 surface noise / ~1 px silhouette
rim" signature (stage-1 capped at ~28 dB while stage-0 read 38).

These tests pin precision=HIGHEST in the jaxpr of every geometry-critical
contraction so the fix cannot silently regress.  (Appearance-path matmuls —
MLPs, encoder splat kernels — intentionally keep the fast default.)
"""

import jax
import jax.numpy as jnp
import numpy as np


def _jaxpr_has_highest(jaxpr_str: str) -> bool:
    return "Precision.HIGHEST" in jaxpr_str or "precision=highest" in jaxpr_str


def test_get_rays_precision():
    from nerf2mesh_tpu.data.rays import get_rays
    pose = jnp.eye(4)[None]
    idx = jnp.arange(8)
    jaxpr = str(jax.make_jaxpr(
        lambda p: get_rays(p, (300.0, 300.0, 128.0, 128.0), 256, 256, idx)
    )(pose))
    assert _jaxpr_has_highest(jaxpr), "get_rays ray rotation lost fp32 precision"
    # multi-pose branch
    poses = jnp.broadcast_to(jnp.eye(4), (8, 4, 4))
    jaxpr = str(jax.make_jaxpr(
        lambda p: get_rays(p, (300.0, 300.0, 128.0, 128.0), 256, 256, idx)
    )(poses))
    assert _jaxpr_has_highest(jaxpr)


def test_transform_clip_precision():
    from nerf2mesh_tpu.models.rasterizer import transform_clip
    v = jnp.zeros((16, 3))
    mvp = jnp.eye(4)
    jaxpr = str(jax.make_jaxpr(transform_clip)(v, mvp))
    assert _jaxpr_has_highest(jaxpr), "clip transform lost fp32 precision"


def test_sampler_tselect_precision():
    from nerf2mesh_tpu.ops.sampling import sample_rays
    occ = jnp.ones((1, 16, 16, 16), bool)
    ro = jnp.asarray(np.array([[0.0, 0.0, 2.0]] * 4, np.float32))
    rd = jnp.asarray(np.array([[0.0, 0.0, -1.0]] * 4, np.float32))
    nears = jnp.full((4,), 0.5)
    fars = jnp.full((4,), 3.5)
    jaxpr = str(jax.make_jaxpr(lambda o, d: sample_rays(
        o, d, occ, nears, fars, num_coarse=16, num_fine=8, grid_size=16,
        cascades=1, bound=1.0, contracted=False, dt_gamma=0.0, max_steps=32,
        perturb=False))(ro, rd))
    assert _jaxpr_has_highest(jaxpr), "sampler t-selection lost fp32 precision"


def test_get_rays_direction_fidelity():
    """Ray directions must hit pixel centers to ~1e-5 px when reprojected
    through the matching MVP (fails at ~0.3 px under bf16 quantization)."""
    from nerf2mesh_tpu.data.rays import get_rays, make_mvps, make_projection
    H = W = 256
    fl = 0.5 * W / np.tan(0.5 * np.deg2rad(45))
    pose = np.eye(4, dtype=np.float32)
    pose[2, 3] = 2.5
    mvp = make_mvps(make_projection(H, W, fl_y=fl, near=0.05), pose[None])[0]
    idx = np.array([37 * W + 122, 200 * W + 18, 128 * W + 128, 5 * W + 250])
    r = get_rays(jnp.asarray(pose[None]), (fl, fl, W / 2, H / 2), H, W,
                 jnp.asarray(idx))
    ro = np.asarray(r["rays_o"], np.float64)
    rd = np.asarray(r["rays_d"], np.float64)
    X = np.concatenate([ro + 1.7 * rd, np.ones((len(idx), 1))], -1)
    clip = X @ np.asarray(mvp, np.float64).T
    ndc = clip[:, :3] / clip[:, 3:4]
    sx = (ndc[:, 0] + 1) * 0.5 * W
    sy = (ndc[:, 1] + 1) * 0.5 * H
    exp_x = (idx % W) + 0.5
    exp_y = (idx // W) + 0.5
    assert np.abs(sx - exp_x).max() < 2e-3, np.abs(sx - exp_x).max()
    assert np.abs(sy - exp_y).max() < 2e-3, np.abs(sy - exp_y).max()
