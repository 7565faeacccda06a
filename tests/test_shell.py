"""Thin-shell stage-1 surface shading (s1_shell): the shell composite must
(a) train end-to-end with finite loss, (b) reduce to sane colors where the
field is smooth, and (c) keep train/eval estimator parity (both call the
same render_stage1_crop path)."""
import dataclasses

import jax.numpy as jnp
import numpy as np

from tests.test_stage1_padding import _mesh


def test_stage1_shell_trains_and_evals(tmp_path):
    from nerf2mesh_tpu.config import Config
    from nerf2mesh_tpu.data.provider import load_nerf_dataset
    from nerf2mesh_tpu.data.synthetic import generate_synthetic_dataset
    from nerf2mesh_tpu.utils.trainer import Trainer

    root = str(tmp_path / "scene")
    generate_synthetic_dataset(root, H=48, W=48, n_train=3, n_val=1, n_test=1)
    cfg = dataclasses.replace(
        Config(path=root, workspace=str(tmp_path / "ws")),
        bound=1.0, scale=0.8, dt_gamma=0.0, iters=3, num_rays=256,
        num_points=4096, max_steps=32, grid_size=32, stage=1,
        s1_crop=32, refine=False, s1_shell=4, s1_shell_h=0.05).finalize()
    tr = Trainer(cfg)
    tr.stage1_mesh = _mesh(2)
    tr._s1_crop = 32
    tr._reset_stage1_params()
    ds = load_nerf_dataset(cfg, "train")
    out = tr.train_stage1(ds, None, max_steps=3)
    assert np.isfinite(float(out["loss"]))

    r = tr.render_image_stage1(ds.poses[0], ds.mvps[0], ds.intrinsics_for(0),
                               ds.H, ds.W)
    assert np.all(np.isfinite(r["image"]))
    assert r["image"].shape == (ds.H, ds.W, 3)


def test_shell_constant_field_matches_single_sample():
    """On a constant-color field the shell composite must agree with the
    single-sample path (same surface, same color everywhere)."""
    import jax

    from nerf2mesh_tpu.config import Config
    from nerf2mesh_tpu.models.network import NetworkSpec, init_network
    from nerf2mesh_tpu.models.rasterizer import RasterSpec
    from nerf2mesh_tpu.models.stage1 import render_stage1_crop
    from tests.test_stage1_padding import _mesh as mk, _mvp

    cfg = Config(path="x").finalize()
    mesh = mk(2)
    spec = NetworkSpec(bound=1.0)
    params = init_network(jax.random.PRNGKey(0), spec)
    rspec = RasterSpec(crop=32, max_tris=2048, frag=8)
    mvp = jnp.asarray(_mvp())
    dirs = jnp.broadcast_to(jnp.asarray([0.0, 0.0, -1.0]), (32, 32, 3))
    bg = jnp.ones((32, 32, 3))
    kw = dict(
        mvp=mvp, crop_origin=jnp.asarray([0, 0]), dirs=dirs, bg_color=bg,
        net_spec=spec, raster_spec=rspec, H=32, W=32, shading="diffuse",
        alpha_mode="area")
    o1 = render_stage1_crop(params, jnp.zeros_like(jnp.asarray(mesh.vertices)),
                            jnp.asarray(mesh.vertices),
                            jnp.asarray(mesh.triangles), **kw)
    oK = render_stage1_crop(params, jnp.zeros_like(jnp.asarray(mesh.vertices)),
                            jnp.asarray(mesh.vertices),
                            jnp.asarray(mesh.triangles), shell_k=4,
                            shell_h=0.04, **kw)
    # a freshly-initialized network is near-constant over a 0.04 shell:
    # covered-pixel colors must agree closely; silhouettes identical
    np.testing.assert_allclose(np.asarray(oK["weights_sum"]),
                               np.asarray(o1["weights_sum"]), atol=1e-6)
    cov = np.asarray(o1["weights_sum"]) > 0.5
    d = np.abs(np.asarray(oK["image"]) - np.asarray(o1["image"]))[cov]
    assert d.max() < 0.02, d.max()
