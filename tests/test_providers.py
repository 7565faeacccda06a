"""Dataset provider tests: colmap binary round-trip + provider contract
(nerf/colmap_provider.py semantics), DTU projection decomposition."""

import os

import numpy as np
import pytest

from nerf2mesh_tpu.config import Config


@pytest.fixture(scope="module")
def colmap_root(tmp_path_factory):
    from nerf2mesh_tpu.data.synthetic import generate_colmap_dataset
    root = str(tmp_path_factory.mktemp("colmap_scene"))
    generate_colmap_dataset(root, H=64, W=64, n_images=10, n_points=600)
    return root


def test_colmap_binary_roundtrip(colmap_root):
    from nerf2mesh_tpu.data.colmap_utils import (
        read_cameras_binary, read_images_binary, read_points3d_binary)
    sp = os.path.join(colmap_root, "sparse", "0")
    cams = read_cameras_binary(os.path.join(sp, "cameras.bin"))
    assert cams[1].model == "PINHOLE"
    assert cams[1].width == 64
    ims = read_images_binary(os.path.join(sp, "images.bin"))
    assert len(ims) == 10
    im = ims[1]
    assert im.name == "frame_0000.png"
    assert im.xys.shape[1] == 2
    assert (im.point3D_ids > 0).all()
    pts = read_points3d_binary(os.path.join(sp, "points3D.bin"))
    assert len(pts) == 600
    # R is orthonormal
    R = im.qvec2rotmat()
    np.testing.assert_allclose(R @ R.T, np.eye(3), atol=1e-8)


def test_colmap_provider_loads(colmap_root):
    import dataclasses
    from nerf2mesh_tpu.data.colmap import load_colmap_dataset
    cfg = dataclasses.replace(Config(path=colmap_root), bound=2.0,
                              enable_cam_near_far=True).finalize()
    ds = load_colmap_dataset(cfg, "train")
    assert ds.images is not None
    assert ds.images.shape[1:] == (64, 64, 3)
    assert ds.intrinsics.ndim == 2                 # per-image
    assert ds.cam_near_far is not None
    assert (ds.cam_near_far[:, 1] > ds.cam_near_far[:, 0]).all()
    # auto-scale puts nearest camera at radius 1
    r = np.linalg.norm(ds.poses[:, :3, 3], axis=-1)
    assert abs(r.min() - 1.0) < 0.2
    # pts_aabb is a sane box containing the scene center
    assert (ds.pts_aabb[:3] < 0).all() and (ds.pts_aabb[3:] > 0).all()
    # val split = every 8th of total -> train = rest
    val = load_colmap_dataset(cfg, "val")
    assert val.num_frames + ds.num_frames == 10
    # pose convention: rays through pixel centers should point at the scene
    # (camera z-axis in the cam2world rotation is the backward axis)
    fwd = -ds.poses[:, :3, 2]
    to_center = -ds.poses[:, :3, 3]
    to_center /= np.linalg.norm(to_center, axis=-1, keepdims=True)
    cosang = np.sum(fwd * to_center, axis=-1)
    assert (cosang > 0.9).all()


def test_colmap_sparse_depth(colmap_root):
    import dataclasses
    from nerf2mesh_tpu.data.colmap import load_colmap_dataset
    cfg = dataclasses.replace(Config(path=colmap_root), bound=2.0,
                              enable_sparse_depth=True).finalize()
    ds = load_colmap_dataset(cfg, "train")
    assert ds.sparse_depth is not None
    xy, d, w = ds.sparse_depth[0]
    assert len(xy) == len(d) == len(w)
    assert (d > 0).all()        # all tracked points in front of the camera


def test_dtu_decompose_projection():
    from nerf2mesh_tpu.data.dtu import decompose_projection
    rng = np.random.default_rng(0)
    K = np.array([[500.0, 0, 32], [0, 510.0, 30], [0, 0, 1]])
    # random rotation
    q, _ = np.linalg.qr(rng.normal(size=(3, 3)))
    if np.linalg.det(q) < 0:
        q[:, 0] *= -1
    t = rng.normal(size=3)
    Rt = np.concatenate([q, t[:, None]], -1)
    P = K @ Rt
    intr, pose = decompose_projection(P)
    np.testing.assert_allclose(intr, [500, 510, 32, 30], rtol=1e-6)
    # pose is cam2world: R^T and camera center -R^T t
    np.testing.assert_allclose(pose[:3, :3], q.T, atol=1e-8)
    np.testing.assert_allclose(pose[:3, 3], -q.T @ t, atol=1e-6)


def test_hard_scene_generator(tmp_path):
    """HardScene: textured/thin/specular proxy renders + round-trips."""
    import numpy as np
    from nerf2mesh_tpu.data.synthetic import (HardScene,
                                              generate_synthetic_dataset)
    root = generate_synthetic_dataset(
        str(tmp_path / "hard"), scene=HardScene(), H=48, W=48,
        n_train=2, n_val=1, n_test=1)
    from nerf2mesh_tpu.config import Config
    from nerf2mesh_tpu.data.provider import load_nerf_dataset
    cfg = Config(path=root).finalize()
    ds = load_nerf_dataset(cfg, "train")
    assert ds.images.shape == (2, 48, 48, 4)
    a = ds.images[..., 3] / 255.0
    assert 0.05 < a.mean() < 0.6          # object coverage
    # view dependence: specular highlights move between views
    s = HardScene()
    d = s.sdf(np.random.uniform(-0.8, 0.8, (2000, 3)).astype(np.float32))
    assert (d < 0).any() and (d > 0.1).any()
