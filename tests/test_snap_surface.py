"""snap_to_apparent_surface: vertices of a dilated sphere mesh must land on
the volume-render expected surface of an analytic density field."""

import jax.numpy as jnp
import numpy as np

from nerf2mesh_tpu.models.stage1 import snap_to_apparent_surface
from tests.test_stage1_padding import _icosphere


def test_snap_pulls_dilated_sphere_to_surface():
    R = 0.4
    v, f = _icosphere(2)                      # radius 0.5
    v = v * (0.46 / 0.5)                      # dilated mesh at r=0.46

    def sigma_fn(params, x):
        r = jnp.linalg.norm(x, axis=-1)
        return jnp.where(r < R, 300.0, 0.0)

    out = snap_to_apparent_surface(None, v, f, None, band=0.08,
                                   n_samples=64, sigma_fn=sigma_fn)
    r_new = np.linalg.norm(out, axis=-1)
    # expected depth of a sharp field = entry point (+ ~1 ramp sample)
    assert np.abs(r_new - R).mean() < 0.01, np.abs(r_new - R).mean()
    assert np.abs(r_new - R).max() < 0.03


def test_snap_keeps_vertices_in_empty_space():
    v, f = _icosphere(1)

    def sigma_fn(params, x):
        return jnp.zeros(x.shape[:-1])

    out = snap_to_apparent_surface(None, v, f, None, band=0.08,
                                   sigma_fn=sigma_fn)
    np.testing.assert_allclose(out, v, atol=1e-6)


def test_snap_handles_inverted_normals():
    """Auto-orientation: flipping the mesh winding must not change the
    result (normals are re-oriented per vertex by the density test)."""
    R = 0.4
    v, f = _icosphere(2)
    v = v * (0.46 / 0.5)
    f_flipped = f[:, ::-1].copy()

    def sigma_fn(params, x):
        r = jnp.linalg.norm(x, axis=-1)
        return jnp.where(r < R, 300.0, 0.0)

    a = snap_to_apparent_surface(None, v, f, None, band=0.08,
                                 n_samples=64, sigma_fn=sigma_fn)
    b = snap_to_apparent_surface(None, v, f_flipped, None, band=0.08,
                                 n_samples=64, sigma_fn=sigma_fn)
    np.testing.assert_allclose(a, b, atol=1e-5)


def test_snap_multipass_converges_from_far():
    """passes=3 coarse-to-fine: a mesh ~0.09 off the surface (beyond what a
    narrow band reaches) converges to sub-voxel accuracy when the first
    pass's band covers the error (round-4 capstone fix)."""
    R = 0.4
    v, f = _icosphere(2)
    v = v * (0.49 / 0.5)                      # mesh at r=0.49, error 0.09

    def sigma_fn(params, x):
        r = jnp.linalg.norm(x, axis=-1)
        return 300.0 / (1.0 + jnp.exp((r - R) / 0.004))   # soft ramp

    out = snap_to_apparent_surface(None, v, f, None, band=0.12,
                                   n_samples=24, passes=3,
                                   sigma_fn=sigma_fn)
    r_new = np.linalg.norm(out, axis=-1)
    err = np.abs(r_new - R)
    assert err.mean() < 0.008, err.mean()
    assert err.max() < 0.02, err.max()
