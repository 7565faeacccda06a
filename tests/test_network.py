"""Field-network unit tests: activations, NeuS alpha conversion, shading
switch, SH encoder sanity."""

import jax
import jax.numpy as jnp
import numpy as np

from nerf2mesh_tpu.models.network import (
    NetworkSpec, density, field_forward, init_network,
)
from nerf2mesh_tpu.models.renderer import neus_alpha_from_sdf
from nerf2mesh_tpu.ops.activation import trunc_exp
from nerf2mesh_tpu.ops.sh import sh_encode


def test_trunc_exp_grad_clamp():
    g = jax.grad(lambda x: trunc_exp(x))(30.0)
    # gradient uses exp(clip(x, -15, 15))
    np.testing.assert_allclose(float(g), np.exp(15.0), rtol=1e-6)
    assert np.isfinite(float(trunc_exp(jnp.asarray(30.0))))


def test_neus_alpha_behavior():
    """Front-facing surface crossing produces high alpha; flat far-from-surface
    regions produce ~0 (renderer.py:724-739 semantics)."""
    dirs = jnp.asarray([[0.0, 0, -1]] * 3)
    normal = jnp.asarray([[0.0, 0, 1]] * 3)       # facing the camera
    dts = jnp.full((3,), 0.05)
    inv_s = jnp.asarray(np.exp(0.3 * 10))
    sdf = jnp.asarray([0.0, 1.0, -1.0])           # at / before / behind surface
    a = neus_alpha_from_sdf(sdf, normal, dirs, dts, inv_s, jnp.asarray(1.0))
    a = np.asarray(a)
    assert a[0] > 0.1                 # surface crossing
    assert a[1] < 1e-3                # far in front
    assert 0.0 <= a.min() and a.max() <= 1.0


def test_diffuse_full_switch():
    spec = NetworkSpec(bound=1.0, log2_hashmap_size=10, num_levels=4)
    params = init_network(jax.random.PRNGKey(0), spec)
    x = jax.random.uniform(jax.random.PRNGKey(1), (8, 3), minval=-1, maxval=1)
    d = jnp.tile(jnp.asarray([[0.0, 0, 1]]), (8, 1))
    _, c_diff, s_diff, _ = field_forward(params, x, d, spec, jnp.asarray(False))
    _, c_full, s_full, _ = field_forward(params, x, d, spec, jnp.asarray(True))
    assert np.allclose(np.asarray(s_diff), 0)             # no specular in warmup
    assert np.any(np.asarray(s_full) != 0)
    # full = clamp(diffuse + specular)
    np.testing.assert_allclose(
        np.asarray(c_full), np.clip(np.asarray(c_diff) + np.asarray(s_full), 0, 1),
        atol=1e-6)


def test_density_separate_vs_merged_shapes():
    for sep in (False, True):
        spec = NetworkSpec(bound=1.0, log2_hashmap_size=10, num_levels=4,
                           separate_tables=sep)
        params = init_network(jax.random.PRNGKey(0), spec)
        x = jnp.zeros((5, 3))
        sig = density(params, x, spec)
        assert sig.shape == (5,)


def test_sh_encoder_sanity():
    """l=0 constant; the degree-2 band is a rotation-equivariant linear map of
    the direction (norm preserved across directions)."""
    dirs = jnp.asarray([[0, 0, 1.0], [1.0, 0, 0], [0.577, 0.577, 0.577]])
    out = np.asarray(sh_encode(dirs, degree=2))
    np.testing.assert_allclose(out[:, 0], 0.2821, atol=1e-3)   # 1/(2 sqrt(pi))
    band1 = out[:, 1:4]
    norms = np.linalg.norm(band1, axis=-1)
    np.testing.assert_allclose(norms, norms[0], rtol=1e-3)


def test_sh_encoder_reference_golden():
    """Degree-3 golden values against the reference kernel's hard-coded
    constants (shencoder.cu:28-80), including the Condon-Shortley phase on
    odd-m components (outputs[1] = -0.4886*y etc.)."""
    x, y, z = 0.3, -0.5, 0.81240384  # unit vector
    out = np.asarray(sh_encode(jnp.asarray([[x, y, z]]), degree=3))[0]
    expect = np.array([
        0.28209479177387814,
        -0.48860251190291987 * y,
        0.48860251190291987 * z,
        -0.48860251190291987 * x,
        1.0925484305920792 * x * y,
        -1.0925484305920792 * y * z,
        0.94617469575755997 * z * z - 0.31539156525251999,
        -1.0925484305920792 * x * z,
        0.54627421529603959 * (x * x - y * y),
    ])
    np.testing.assert_allclose(out, expect, atol=1e-6)


def test_update_density_grid_modes():
    """EMA vs trainable (--trainable_density_grid) grid updates: both refresh
    occupancy; trainable descends toward fresh queries and keeps -1 cells."""
    import numpy as np
    from nerf2mesh_tpu.models.renderer import (
        RenderSpec, init_render_state, update_density_grid)

    spec = NetworkSpec(bound=1.0, log2_hashmap_size=8, num_levels=4)
    params = init_network(jax.random.PRNGKey(0), spec)
    rspec = RenderSpec(bound=1.0, grid_size=16, max_steps=64)
    st = init_render_state(rspec)
    # mark one cell untrained
    grid = st.density_grid.at[0, 0, 0, 0].set(-1.0)
    st = st._replace(density_grid=grid)
    key = jax.random.PRNGKey(1)

    ema = update_density_grid(params, st, key, rspec, spec)
    assert float(ema.density_grid[0, 0, 0, 0]) == -1.0
    assert float(ema.mean_density) >= 0.0
    assert int(ema.iter_density) == 1

    tr = update_density_grid(params, st, key, rspec, spec,
                             trainable=True, lambda_density=1e-4, grid_lr=0.1)
    assert float(tr.density_grid[0, 0, 0, 0]) == -1.0
    g = np.asarray(tr.density_grid)
    assert np.isfinite(g).all()
    # grid started at 0 and queries are non-negative: descent must move it up
    assert g.max() > 0.0
