"""Bucket-padded stage-1 buffers: padding must be inert (identical renders
and losses) and must let refines reuse the compiled step (the point of the
design — topology changes previously re-jitted ~minutes per refine)."""
import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from nerf2mesh_tpu.models.stage1 import (
    Stage1Mesh, edge_length_loss, laplacian_loss, normal_consistency_loss,
    offsets_loss, pad_stage1_buffers)
from nerf2mesh_tpu.models.rasterizer import (
    RasterSpec, rasterize_crop, transform_clip)


def _icosphere(sub=1, n_th=None, n_ph=None):
    """UV sphere (radius 0.5) built with numpy; `sub` controls tessellation."""
    if n_th is None:
        n_th, n_ph = 6 * (sub + 1), 8 * (sub + 1)
    th = np.linspace(0.15, np.pi - 0.15, n_th)
    ph = np.linspace(0.0, 2 * np.pi, n_ph, endpoint=False)
    T, P = np.meshgrid(th, ph, indexing="ij")
    v = 0.5 * np.stack([np.sin(T) * np.cos(P), np.sin(T) * np.sin(P),
                        np.cos(T)], -1).reshape(-1, 3)
    idx = np.arange(n_th * n_ph).reshape(n_th, n_ph)
    a = idx[:-1, :]; b = idx[1:, :]
    c = np.roll(idx[:-1, :], -1, axis=1); d = np.roll(idx[1:, :], -1, axis=1)
    f = np.concatenate([np.stack([a, b, c], -1).reshape(-1, 3),
                        np.stack([c, b, d], -1).reshape(-1, 3)])
    return v.astype(np.float32), f.astype(np.int32)


def _mesh(sub=1, **kw):
    v, f = _icosphere(sub, **kw)
    return Stage1Mesh(vertices=v, triangles=f,
                      v_cumsum=np.asarray([0, len(v)]),
                      f_cumsum=np.asarray([0, len(f)]))


def _mvp():
    # simple look-at from +z with a perspective projection
    proj = np.array([[1.2, 0, 0, 0], [0, 1.2, 0, 0],
                     [0, 0, -1.02, -0.202], [0, 0, -1, 0]], np.float32)
    view = np.eye(4, dtype=np.float32)
    view[2, 3] = -2.0
    return proj @ view


def test_padded_raster_matches_unpadded():
    mesh = _mesh(1)
    pad = pad_stage1_buffers(mesh, min_b=1024)
    assert len(pad["triangles"]) >= mesh.num_faces
    assert np.all(pad["counts"] == [mesh.num_vertices, mesh.num_faces,
                                    len(mesh.edges), len(mesh.face_pairs),
                                    mesh.num_vertices])

    mvp = jnp.asarray(_mvp())
    spec = RasterSpec(crop=64, max_tris=1024, frag=8)
    H = W = 64
    origin = jnp.asarray([0, 0])

    clip_r = transform_clip(jnp.asarray(mesh.vertices), mvp)
    r_ref = rasterize_crop(clip_r, jnp.asarray(mesh.triangles), origin,
                           H, W, spec)
    clip_p = transform_clip(jnp.asarray(pad["vertices"]), mvp)
    r_pad = rasterize_crop(clip_p, jnp.asarray(pad["triangles"]), origin,
                           H, W, spec,
                           f_valid=jnp.asarray(mesh.num_faces))
    assert int(r_ref["overflow"]) == 0 and int(r_pad["overflow"]) == 0
    np.testing.assert_array_equal(np.asarray(r_ref["tri_id"]),
                                  np.asarray(r_pad["tri_id"]))
    np.testing.assert_allclose(np.asarray(r_ref["alpha"]),
                               np.asarray(r_pad["alpha"]), atol=1e-6)
    np.testing.assert_allclose(np.asarray(r_ref["depth"]),
                               np.asarray(r_pad["depth"]), atol=1e-6)
    # without the mask, pad faces (degenerate, at the pad vertex) would at
    # minimum eat compaction slots; with it the winner set is identical


def test_padded_losses_match_unpadded():
    mesh = _mesh(1)
    pad = pad_stage1_buffers(mesh, min_b=1024)
    rng = np.random.default_rng(0)
    off = rng.normal(size=(mesh.num_vertices, 3)).astype(np.float32) * 0.01
    off_p = np.zeros((len(pad["vertices"]), 3), np.float32)
    off_p[:mesh.num_vertices] = off

    v = jnp.asarray(mesh.vertices + off)
    vp = jnp.asarray(pad["vertices"] + off_p)
    c = pad["counts"]
    v_real, f_real, e_real, p_real, v_inner = [jnp.asarray(x) for x in c]

    ref = laplacian_loss(v, jnp.asarray(mesh.edges),
                         jnp.asarray(mesh.vert_degree))
    got = laplacian_loss(vp, jnp.asarray(pad["edges"]),
                         jnp.asarray(pad["vert_degree"]), v_real, e_real)
    np.testing.assert_allclose(float(got), float(ref), rtol=1e-5)

    ref = normal_consistency_loss(v, jnp.asarray(mesh.triangles),
                                  jnp.asarray(mesh.face_pairs))
    got = normal_consistency_loss(vp, jnp.asarray(pad["triangles"]),
                                  jnp.asarray(pad["face_pairs"]), p_real)
    np.testing.assert_allclose(float(got), float(ref), rtol=1e-5)

    ref = edge_length_loss(v, jnp.asarray(mesh.edges))
    got = edge_length_loss(vp, jnp.asarray(pad["edges"]), e_real)
    np.testing.assert_allclose(float(got), float(ref), rtol=1e-5)

    # traced-v_inner masked offsets loss vs the static-slice reference,
    # including an inner/outer split
    vi = mesh.num_vertices // 2
    ref = offsets_loss(jnp.asarray(off), vi, 1.0)
    got = offsets_loss(jnp.asarray(off_p), jnp.asarray(vi), 1.0, v_real)
    np.testing.assert_allclose(float(got), float(ref), rtol=1e-5)


def test_refine_reuses_compiled_step(tmp_path):
    """Two topologies in the same bucket must share one compiled executable
    (shape-stable buffers + mesh-as-arguments step)."""
    from nerf2mesh_tpu.config import Config
    from nerf2mesh_tpu.data.provider import load_nerf_dataset
    from nerf2mesh_tpu.data.synthetic import generate_synthetic_dataset
    from nerf2mesh_tpu.utils.trainer import Trainer

    root = str(tmp_path / "scene")
    generate_synthetic_dataset(root, H=48, W=48, n_train=3, n_val=1, n_test=1)
    cfg = dataclasses.replace(
        Config(path=root, workspace=str(tmp_path / "ws")),
        bound=1.0, scale=0.8, dt_gamma=0.0, iters=4, num_rays=256,
        num_points=4096, max_steps=32, grid_size=32, stage=1,
        s1_crop=32, refine=False).finalize()
    tr = Trainer(cfg)

    mesh = _mesh(1)          # 80 faces
    tr.stage1_mesh = mesh
    tr._s1_crop = 32
    tr._reset_stage1_params()
    fn1 = tr._build_stage1_step()
    shapes1 = (tr.mesh_v.shape, tr.mesh_f.shape, tr.mesh_edges.shape,
               tr.mesh_pairs.shape)

    mesh2 = _mesh(0, n_th=10, n_ph=14)   # 252 faces — same buckets
    tr.stage1_mesh = mesh2
    tr._reset_stage1_params()
    fn2 = tr._build_stage1_step()
    shapes2 = (tr.mesh_v.shape, tr.mesh_f.shape, tr.mesh_edges.shape,
               tr.mesh_pairs.shape)

    assert shapes1 == shapes2, "same bucket must produce identical shapes"
    assert fn1 is fn2, "step wrapper must be reused across refines"
    # offsets must have been re-initialized (different real topology)
    assert float(jnp.abs(tr.state.params["vertices_offsets"]).max()) == 0.0


def test_stage1_train_steps_padded(tmp_path):
    """End-to-end: a few stage-1 steps on padded buffers produce finite loss
    and only accumulate errors on real faces."""
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
        s1_crop=32, refine=False).finalize()
    tr = Trainer(cfg)
    tr.stage1_mesh = _mesh(2)
    tr._s1_crop = 32
    tr._reset_stage1_params()
    ds = load_nerf_dataset(cfg, "train")
    out = tr.train_stage1(ds, None, max_steps=3)
    assert np.isfinite(float(out["loss"]))
    f_real = tr._s1_real_shape[1]
    errs = np.asarray(tr.tri_errors)
    assert errs.shape[0] >= f_real
    assert np.all(errs[f_real:] == 0.0), "pad faces accumulated error"
