"""Isolate the `area` coverage estimator's rim bias with EXACT geometry.

Oracle probe (round 4) measured rim cov-MAE 0.068 / mean +0.06 OVERcoverage
even with vertices projected exactly onto the analytic surface.  Question:
is that the estimator (area-sum double-counting silhouette-fold straddlers /
occluded front surfaces) or geometry discretization (polyhedral chord)?

Setup: icosphere (subdiv 5, 20480 faces) of radius 0.5 at the origin,
orbit camera, 256x256.  Compare per-pixel:
  A. cov_area   — rasterize_crop()["area"] at 1 spp (the train estimator)
  B. cov_ss     — strict pixel-center coverage at ssaa=4, average-pooled
                  (near-exact UNION coverage of the same mesh)
  C. cov_true   — analytic sphere coverage (16x16 subpixel ray tests)
on the rim band (0 < cov_true < 1 dilated by 1px).  A-B = estimator bias,
B-C = discretization.  Run on CPU.
"""
import sys

sys.path.insert(0, "/root/repo")

import jax

jax.config.update("jax_platforms", "cpu")

import numpy as np
import jax.numpy as jnp

from nerf2mesh_tpu.data.rays import make_projection, orbit_pose
from nerf2mesh_tpu.models.rasterizer import (RasterSpec, rasterize_crop,
                                             transform_clip)
from bench import _icosphere

H = W = 256
R_SPHERE = 0.5
FL = 300.0  # focal px


def full_frame(verts, tris, mvp, res, spec):
    vc = transform_clip(jnp.asarray(verts), jnp.asarray(mvp))
    tt = jnp.asarray(tris)
    C = spec.crop
    n = res // C
    area = np.zeros((res, res), np.float32)
    strict = np.zeros((res, res), np.float32)
    alpha = np.zeros((res, res), np.float32)
    ovf = 0
    for iy in range(n):
        for ix in range(n):
            r = rasterize_crop(vc, tt, jnp.asarray([iy * C, ix * C]),
                               res, res, spec)
            area[iy * C:(iy + 1) * C, ix * C:(ix + 1) * C] = np.asarray(
                r["area"])
            strict[iy * C:(iy + 1) * C, ix * C:(ix + 1) * C] = np.asarray(
                r["strict"]).astype(np.float32)
            alpha[iy * C:(iy + 1) * C, ix * C:(ix + 1) * C] = np.asarray(
                r["alpha"])
            ovf += int(np.asarray(r["overflow"]))
    if ovf:
        print(f"  [overflow: {ovf} dropped across {n*n} crops]")
    return area, strict, alpha


def analytic_cov(pose, res, sub=16):
    """Subpixel ray-sphere binary hits, averaged."""
    fx = fy = FL * res / H
    cx = cy = res / 2.0
    s = sub
    ys, xs = np.meshgrid(np.arange(res * s), np.arange(res * s),
                         indexing="ij")
    px = (xs + 0.5) / s
    py = (ys + 0.5) / s
    dirs = np.stack([(px - cx) / fx, -(py - cy) / fy,
                     -np.ones_like(px)], -1)
    dirs /= np.linalg.norm(dirs, axis=-1, keepdims=True)
    rd = dirs @ pose[:3, :3].T
    ro = pose[:3, 3]
    b = rd @ ro
    c = ro @ ro - R_SPHERE ** 2
    hit = (b * b - c) > 0
    return hit.reshape(res, s, res, s).mean((1, 3)).astype(np.float32)


def mc_sphere_mesh(reso=128, decimate_to=8000):
    """Sphere mesh through the CAPSTONE pipeline: marching cubes on the
    SDF grid -> clean -> decimate -> subdivide_for_raster -> oracle-project
    every vertex back onto the analytic sphere.  Mimics the mesh quality of
    the real stage-1 runs (irregular tris, slivers) at exact geometry."""
    from nerf2mesh_tpu.meshing.marching_cubes import marching_cubes
    from nerf2mesh_tpu.meshing.meshops import clean_mesh, decimate_mesh
    from nerf2mesh_tpu.models.rasterizer import subdivide_for_raster
    g = np.linspace(-0.7, 0.7, reso, dtype=np.float32)
    X, Y, Z = np.meshgrid(g, g, g, indexing="ij")
    sdf = np.sqrt(X ** 2 + Y ** 2 + Z ** 2) - R_SPHERE
    v, f = marching_cubes(-sdf, 0.0)
    v = v / (reso - 1) * 1.4 - 0.7
    v, f = clean_mesh(v, f, remesh=False)
    v, f = decimate_mesh(v, f, decimate_to)
    # screen-edge bound like setup_stage1 (~1.4 px at FL=300, z~1.7)
    v, f = subdivide_for_raster(v, f.astype(np.int32), max_edge=0.008,
                                max_faces=120000)
    v = v / np.linalg.norm(v, axis=1, keepdims=True) * R_SPHERE
    return v.astype(np.float32), f.astype(np.int32)


def main():
    v, f = _icosphere(5)
    v = v * R_SPHERE
    pose = orbit_pose(0.8, 0.4, 2.2)
    proj = make_projection(H, W, FL, 0.05)
    mvp = proj @ np.linalg.inv(pose)

    spec1 = RasterSpec(crop=128, max_tris=16384, frag=8, max_frags=1 << 21)
    cov_area, strict1, alpha1 = full_frame(v, f, mvp, H, spec1)

    # ssaa=4 strict union: render at 1024 with the mvp of the SAME camera.
    # Screen scale x4: projection is resolution-invariant (fl scales with
    # res), so the same mvp works at any raster res.
    s = 4
    spec4 = RasterSpec(crop=128, max_tris=16384, frag=8, max_frags=1 << 21)
    _, strict4, _ = full_frame(v, f, mvp, H * s, spec4)
    cov_ss = strict4.reshape(H, s, W, s).mean((1, 3))

    cov_true = analytic_cov(pose, H, sub=16)

    rim = (cov_true > 0.0) & (cov_true < 1.0)
    # dilate 1px
    rim = (np.pad(rim, 1)[:-2, 1:-1] | np.pad(rim, 1)[2:, 1:-1]
           | np.pad(rim, 1)[1:-1, :-2] | np.pad(rim, 1)[1:-1, 2:] | rim)

    def stats(name, a, b):
        d = (a - b)[rim]
        print(f"  {name:28s} mean {d.mean():+.4f}  MAE {np.abs(d).mean():.4f}"
              f"  p95|d| {np.percentile(np.abs(d), 95):.4f}")

    print(f"[rim band: {rim.sum()} px of {H*W}]")
    print("estimator vs true-mesh-union (B):")
    stats("area_1spp - strict_ss4", cov_area, cov_ss)
    stats("alpha(soft)_1spp - strict_ss4", alpha1, cov_ss)
    stats("strict_1spp - strict_ss4", strict1, cov_ss)
    print("geometry vs analytic (C):")
    stats("strict_ss4 - analytic", cov_ss, cov_true)
    print("end-to-end:")
    stats("area_1spp - analytic", cov_area, cov_true)
    stats("alpha_1spp - analytic", alpha1, cov_true)

    print("== D. marching-cubes-pipeline mesh (oracle-projected verts)")
    vm, fm = mc_sphere_mesh()
    print(f"  mc mesh: v={len(vm)} f={len(fm)}")
    for mt in (16384, 65536, 131072):
        specd = RasterSpec(crop=128, max_tris=mt, frag=8,
                           max_frags=1 << 22)
        cov_area_m, strict_m, alpha_m = full_frame(vm, fm, mvp, H, specd)
        stats(f"mc area_1spp(mt={mt}) - true", cov_area_m, cov_true)
    stats("mc alpha_1spp - analytic", alpha_m, cov_true)
    specs4 = RasterSpec(crop=128, max_tris=65536, frag=8, max_frags=1 << 22)
    _, strict4m, _ = full_frame(vm, fm, mvp, H * 4, specs4)
    cov_ss_m = strict4m.reshape(H, 4, W, 4).mean((1, 3))
    stats("mc strict_ss4 - analytic", cov_ss_m, cov_true)
    stats("mc area_1spp - strict_ss4", cov_area_m, cov_ss_m)


if __name__ == "__main__":
    main()
