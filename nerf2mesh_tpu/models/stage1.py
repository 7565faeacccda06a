"""Stage 1: mesh refinement through differentiable rasterization.

Parity targets in the reference:
  * mesh loading + learnable vertex offsets:  renderer.py:121-165
  * render_stage1 (rasterize -> masked field query -> antialias):
    renderer.py:816-921
  * per-face error accumulation: renderer.py:923-943
  * refine_and_decimate: renderer.py:209-294
  * smoothness losses (laplacian / normal consistency / edge length):
    utils.py:116-221, 759-769

TPU-native differences: training renders random crops (see rasterizer.py);
mesh topology is host state (numpy) rebuilt at refine steps, with device
arrays re-uploaded and the step function re-jitted (topology changes 6x per
run — reference refine_steps — so recompiles are cheap relative to training).
"""

from __future__ import annotations

import os
from dataclasses import dataclass, field
from typing import Dict, List, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ..ops.contraction import contract
from .network import NetworkSpec, rgb as field_rgb
from .rasterizer import RasterSpec, interpolate, rasterize_crop, transform_clip


@dataclass
class Stage1Mesh:
    """Host-side mesh topology + device buffers (rebuilt on refine)."""
    vertices: np.ndarray          # [V, 3] float32 (base positions)
    triangles: np.ndarray         # [F, 3] int32
    v_cumsum: np.ndarray          # [cascades+1]
    f_cumsum: np.ndarray
    edges: np.ndarray = None            # [E, 2] unique edges
    face_pairs: np.ndarray = None       # [P, 2] adjacent face ids (shared edge)
    vert_degree: np.ndarray = None      # [V]

    def __post_init__(self):
        self.build_adjacency()

    def build_adjacency(self):
        t = self.triangles.astype(np.int64)
        e = np.concatenate([t[:, [0, 1]], t[:, [1, 2]], t[:, [2, 0]]])
        fid = np.tile(np.arange(len(t)), 3)
        e_sorted = np.sort(e, axis=1)
        key = e_sorted[:, 0] * (len(self.vertices) + 1) + e_sorted[:, 1]
        order = np.argsort(key, kind="stable")
        key_s, fid_s, e_s = key[order], fid[order], e_sorted[order]
        uniq_mask = np.concatenate([[True], key_s[1:] != key_s[:-1]])
        self.edges = e_s[uniq_mask].astype(np.int32)
        # adjacent face pairs: consecutive duplicates in sorted key
        pair_mask = ~uniq_mask
        self.face_pairs = np.stack(
            [fid_s[np.nonzero(pair_mask)[0] - 1], fid_s[pair_mask]], -1
        ).astype(np.int32)
        deg = np.bincount(self.edges.reshape(-1), minlength=len(self.vertices))
        self.vert_degree = np.maximum(deg, 1).astype(np.float32)

    @property
    def num_vertices(self) -> int:
        return len(self.vertices)

    @property
    def num_faces(self) -> int:
        return len(self.triangles)


def camera_min_depth(poses: np.ndarray, v_lo: np.ndarray, v_hi: np.ndarray,
                     floor: float = 0.1) -> float:
    """Conservative minimum camera-space depth of any mesh point over all
    training views: euclidean distance from each camera origin to the mesh
    AABB, times cos(~max half-FOV) since off-axis points have depth
    dist*cos(angle).  Bounds the worst-case screen size of a world-space edge
    (screen_px ~ edge * fl / z)."""
    poses = np.asarray(poses)
    cams = poses[:, :3, 3]                                    # [N, 3]
    d = np.maximum(np.maximum(v_lo[None] - cams, 0.0), cams - v_hi[None])
    dist = np.linalg.norm(d, axis=-1)
    return max(float(dist.min()) * 0.7, floor)


def load_stage1_mesh(workspace: str, cascades: int, mesh_path: str = "",
                     use_updated: bool = True,
                     max_screen_edge: float = 0.0,
                     poses: Optional[np.ndarray] = None,
                     max_faces: int = 0,
                     face_budget: int = 0) -> Stage1Mesh:
    """Load cascade meshes from mesh_stage0/ (renderer.py:130-153).

    max_screen_edge is the world-edge bound AT UNIT DEPTH (frag_px/fl); the
    actual bound per cascade is scaled by the measured minimum camera depth
    (round 1 assumed z=1 while the scene sat at z~2.5, exploding the face
    count 42x past the raster budget).  max_faces caps the per-cascade face
    count after subdivision.

    face_budget > 0 decimates the inner (cascade-0) BASE mesh down to the
    budget before raster subdivision.  This is the screen-space face-size
    control: the analytic-AA silhouette gradient (the only photometric
    channel into vertex offsets, rasterizer.antialias) needs the winner
    triangle's edges to actually cross between adjacent pixel centers, which
    dies when faces are deeply sub-pixel.  The reference trains ~1e5 faces at
    800-1600 px (>= ~10 visible px/face, nvdiffrast antialias contract,
    renderer.py:884-887); exporting reference-scale face counts onto this
    pipeline's 256 px training images left ~0.4 px/face and froze the rim
    (round-3 s1_cpu_debug: rim coverage 0.82 vs GT alpha 0.49, untrainable).
    """
    from ..meshing.io import read_ply

    verts, tris = [], []
    v_cumsum, f_cumsum = [0], [0]
    for cas in range(cascades):
        base = os.path.join(workspace, "mesh_stage0")
        upd = os.path.join(base, f"mesh_{cas}_updated.ply")
        is_updated = False
        if mesh_path:
            p = mesh_path
        elif use_updated and os.path.exists(upd):
            p = upd
            is_updated = True
        else:
            p = os.path.join(base, f"mesh_{cas}.ply")
        v, f = read_ply(p)
        if (face_budget > 0 and cas == 0 and not is_updated
                and len(f) > face_budget):
            from ..meshing import meshops
            print(f"[load_stage1_mesh] decimating cascade 0 to the "
                  f"screen-resolution face budget: {len(f)} -> {face_budget}")
            v, f = meshops.decimate_mesh(v, f, target=face_budget)
        # subdivide only the base mesh so the raster fragment-block bound
        # holds; updated meshes already carry refined topology and must stay
        # byte-stable across reloads (checkpointed offsets index them).
        if max_screen_edge > 0 and not is_updated:
            from .rasterizer import subdivide_for_raster
            max_edge = max_screen_edge
            if poses is not None and len(v) > 0:
                z_min = camera_min_depth(poses, v.min(0), v.max(0))
                max_edge = max_screen_edge * z_min
            v, f = subdivide_for_raster(v, f, max_edge, max_faces=max_faces)
        verts.append(v)
        tris.append(f + v_cumsum[-1])
        v_cumsum.append(v_cumsum[-1] + len(v))
        f_cumsum.append(f_cumsum[-1] + len(f))
    return Stage1Mesh(
        vertices=np.concatenate(verts).astype(np.float32),
        triangles=np.concatenate(tris).astype(np.int32),
        v_cumsum=np.asarray(v_cumsum), f_cumsum=np.asarray(f_cumsum),
    )


def init_offsets(mesh: Stage1Mesh) -> jax.Array:
    return jnp.zeros((mesh.num_vertices, 3), jnp.float32)


def snap_to_apparent_surface(params, verts: np.ndarray, tris: np.ndarray,
                             net_spec, band: float,
                             n_samples: int = 32,
                             chunk: int = 4096,
                             passes: int = 1,
                             sigma_fn=None) -> np.ndarray:
    """Move vertices onto the stage-0 field's APPARENT surface: the
    volume-render expected depth along each vertex normal.

    Marching cubes extracts the sigma=thresh isosurface, which sits
    systematically OUTSIDE the surface a volume render actually shows (the
    sigma ramp reaches thresh early); the round-4 oracle probe measured the
    capstone mesh a median 0.03 ngp units (~4 px) off the true surface, and
    interior eval PSNR 26-28 vs 32-33 when vertices were projected onto the
    truth — vertex positions feed the (detached) field queries that shade
    every pixel, so interior placement is a first-order quality term with NO
    photometric gradient of its own (renderer.py:877-879 detaches xyz).

    For each vertex: probe sigma at n_samples points along +-band on the
    outward normal, integrate transmittance inward, and move the vertex to
    the expected crossing E[t] (the same estimator as the renderer's depth).
    Vertices whose probe accumulates < 0.3 opacity (open space, e.g. culled
    geometry) stay put.  Normals are auto-oriented per vertex by comparing
    sigma at the two band endpoints.

    With passes > 1, the probe repeats with a 3x-narrower band centered on
    the updated positions each time (coarse-to-fine).  Round 4 measured the
    capstone mesh mean 0.031 / p99 0.079 ngp units off the true surface
    while the single 4-voxel-band pass could only move 0.0077: the window
    must COVER the error for E[t] to reach it — callers should pass a band
    >= ~2x the expected placement error and passes=2-3.
    """
    if sigma_fn is None:
        from .network import density

        def sigma_fn(params, x):
            return density(params, x, net_spec)

    v = np.asarray(verts, np.float32)
    t = np.asarray(tris, np.int64)
    fn = np.cross(v[t[:, 1]] - v[t[:, 0]], v[t[:, 2]] - v[t[:, 0]])
    nrm = np.zeros_like(v)
    np.add.at(nrm, t[:, 0], fn)
    np.add.at(nrm, t[:, 1], fn)
    np.add.at(nrm, t[:, 2], fn)
    nrm /= np.maximum(np.linalg.norm(nrm, axis=-1, keepdims=True), 1e-12)

    def make_probe(ns: int):
        # band `b` is a traced scalar: the 3 shrinking passes (and every
        # caller band) share ONE compile — compiles are minutes on this
        # backend and the probe recompiled per pass before
        @jax.jit
        def probe(params, vc, nc, b):
            offs = jnp.linspace(b, -b, ns)
            dt = 2.0 * b / ns
            # orientation check: sigma should be lower on the outward side
            s_out = sigma_fn(params, vc + b * nc)
            s_in = sigma_fn(params, vc - b * nc)
            flip = (s_out > s_in)[:, None]
            n_o = jnp.where(flip, -nc, nc)
            pts = vc[:, None, :] + offs[None, :, None] * n_o[:, None, :]
            sig = sigma_fn(params, pts.reshape(-1, 3))
            sig = sig.reshape(vc.shape[0], ns)
            alpha = 1.0 - jnp.exp(-jnp.maximum(sig, 0.0) * dt)
            T = jnp.cumprod(1.0 - alpha + 1e-7, axis=-1)
            T = jnp.concatenate([jnp.ones_like(T[:, :1]), T[:, :-1]], axis=-1)
            w = T * alpha
            wsum = jnp.sum(w, axis=-1)
            et = jnp.sum(w * offs[None, :], axis=-1) / jnp.maximum(wsum, 1e-6)
            new_v = jnp.where((wsum > 0.3)[:, None],
                              vc + et[:, None] * n_o, vc)
            return new_v, wsum

        return probe

    # small fixed-size chunks: the exact-encode intermediate for a probe of
    # V verts is V*n_samples points and its TPU tile padding OOMs past ~1e6
    # points (round-4 crash: 44k verts in one chunk -> 17.4 GB alloc); the
    # last partial chunk is zero-padded so every probe call reuses one jit.
    out = np.array(v)
    probe = make_probe(n_samples)
    print(f"[snap_to_apparent_surface] compiling probe "
          f"({len(v)} verts, chunk {chunk}, ~10 min first time on the "
          f"relay backend)", flush=True)
    for p in range(max(int(passes), 1)):
        b = band / (3.0 ** p)
        cur = np.array(out)
        moved = 0
        for c0 in range(0, len(v), chunk):
            vb = cur[c0:c0 + chunk]
            nb = nrm[c0:c0 + chunk]
            n_real = len(vb)
            if n_real < chunk:
                vb = np.concatenate(
                    [vb, np.zeros((chunk - n_real, 3), np.float32)])
                nb = np.concatenate(
                    [nb, np.zeros((chunk - n_real, 3), np.float32)])
            nv, ws = probe(params, jnp.asarray(vb), jnp.asarray(nb),
                           jnp.float32(b))
            out[c0:c0 + n_real] = np.asarray(nv)[:n_real]
            moved += int((np.asarray(ws)[:n_real] > 0.3).sum())
            if c0 == 0 or (c0 // chunk) % 8 == 7:
                # liveness for log-staleness watchdogs (first chunk carries
                # the minutes-long jit compile on this backend)
                print(f"[snap_to_apparent_surface] pass {p+1} chunk "
                      f"{c0//chunk + 1}/{-(-len(v)//chunk)}", flush=True)
        d = np.linalg.norm(out - cur, axis=-1)
        print(f"[snap_to_apparent_surface] pass {p+1}/{passes}: moved "
              f"{moved}/{len(v)} vertices, |d| mean {d.mean():.5f} "
              f"p90 {np.percentile(d, 90):.5f} (band {b:.4f})")
    d = np.linalg.norm(out - v, axis=-1)
    print(f"[snap_to_apparent_surface] total |d| mean {d.mean():.5f} "
          f"p90 {np.percentile(d, 90):.5f}")
    return out


def _bucket(n: int, min_b: int = 1024, cap: int = 0) -> int:
    """Next power-of-two size bucket (>= min_b); cap > 0 clamps."""
    b = max(min_b, 1 << int(np.ceil(np.log2(max(n, 1)))))
    if cap > 0:
        b = min(max(b, n), max(cap, n))
    return max(b, n)


def pad_stage1_buffers(mesh: Stage1Mesh, min_b: int = 1024,
                       face_cap: int = 1 << 18,
                       min_f: int = 0) -> Dict[str, np.ndarray]:
    """Pad mesh buffers to power-of-two size buckets so stage-1 refines
    (6 topology changes per run, renderer.py:209-294) keep array SHAPES
    stable and the jitted step/eval functions are reused instead of
    recompiled (remote compiles cost minutes on the axon backend and its
    persistent compile cache is inert — PERF.md).

    Padding is inert by construction + masking:
      * pad vertices sit at 0 with zero offsets; no real face references them
      * pad faces reference the last pad vertex; `rasterize_crop(f_valid=...)`
        masks them out of overlap compaction
      * pad edges/pairs self-reference pad slots; the regularizer losses
        take traced real counts and mask them out of their means
    Returns padded arrays + a `counts` vector
    [v_real, f_real, e_real, p_real, v_inner] consumed as a TRACED step arg.
    """
    V, F = mesh.num_vertices, mesh.num_faces
    E, P = len(mesh.edges), len(mesh.face_pairs)
    # min_f floors the buckets at the refine-growth face budget so a base
    # mesh that starts under budget (headroom for error-driven subdivision)
    # doesn't cross bucket edges mid-run — each crossing recompiles the
    # step (minutes on the axon backend).  Vertex/edge/pair floors follow
    # Euler estimates (V ~ F/2, E ~ P ~ 3F/2).
    Vp = _bucket(max(V, min_f // 2), min_b)
    Fp = _bucket(max(F, min_f), min_b, cap=max(face_cap, F))
    Ep = _bucket(max(E, min_f * 3 // 2), min_b)
    Pp = _bucket(max(P, min_f * 3 // 2), min_b)

    verts = np.zeros((Vp, 3), np.float32)
    verts[:V] = mesh.vertices
    tris = np.full((Fp, 3), Vp - 1, np.int32)
    tris[:F] = mesh.triangles
    edges = np.full((Ep, 2), Vp - 1, np.int32)
    edges[:E] = mesh.edges
    pairs = np.full((Pp, 2), Fp - 1, np.int32)
    pairs[:P] = mesh.face_pairs
    deg = np.ones((Vp,), np.float32)
    deg[:V] = mesh.vert_degree
    counts = np.asarray([V, F, E, P, int(mesh.v_cumsum[1])], np.int32)
    return dict(vertices=verts, triangles=tris, edges=edges,
                face_pairs=pairs, vert_degree=deg, counts=counts)


def render_stage1_crop(
    params: Dict,
    offsets: jax.Array,           # [V, 3] learnable
    mesh_v: jax.Array,            # [V, 3]
    mesh_f: jax.Array,            # [F, 3]
    mvp: jax.Array,               # [4, 4]
    crop_origin: jax.Array,       # [2]
    dirs: jax.Array,              # [C, C, 3] per-pixel view dirs (unnormalized)
    bg_color: jax.Array,          # [C, C, 3]
    net_spec: NetworkSpec,
    raster_spec: RasterSpec,
    H: int, W: int,
    *,
    shading: str = "full",
    ind_code: Optional[jax.Array] = None,
    contracted: bool = False,
    enable_offset_nerf_grad: bool = False,
    pos_gradient_boost: float = 1.0,
    ssaa: int = 1,
    alpha_mode: str = "aa",
    f_valid: Optional[jax.Array] = None,
    shell_k: int = 1,
    shell_h: float = 0.02,
) -> Dict[str, jax.Array]:
    """One differentiable crop render (renderer.py:816-921).

    With ssaa > 1, renders at ssaa x supersampled resolution and average-pools
    the image/depth/alpha back to the crop size (reference renderer.py:825-833
    trains at H*ssaa and downsamples); `dirs` and `bg_color` must then be
    supplied at the supersampled resolution, and the returned `trig_id` stays
    at supersampled resolution for per-face error accumulation.
    """
    import dataclasses

    Cp = raster_spec.crop
    s = max(int(ssaa), 1)
    if s > 1:
        # the live-fragment budget scales with supersampled pixel count:
        # at ssaa=2 a 256^2 crop rasterizes 512^2 = 4x the fragments, and an
        # unscaled max_frags silently drops ~30-50% of rim fragments at
        # capstone face counts (ws96v2 run: 80-234k dropped/step -> holes)
        raster_spec = dataclasses.replace(raster_spec, crop=Cp * s,
                                          max_frags=raster_spec.max_frags
                                          * s * s)
        crop_origin = crop_origin * s
        H, W = H * s, W * s
    Cs = Cp * s
    verts = mesh_v + offsets
    clip = transform_clip(verts, mvp)
    if pos_gradient_boost != 1.0:
        # scale d(loss)/d(clip) like dr.antialias(pos_gradient_boost)
        b = pos_gradient_boost
        clip = clip * b + jax.lax.stop_gradient(clip * (1.0 - b))

    rast = rasterize_crop(clip, mesh_f, crop_origin, H, W, raster_spec,
                          f_valid=f_valid)

    xyzs = interpolate(verts, rast, mesh_f)                       # [C, C, 3]
    if contracted:
        xyzs = contract(xyzs)
    if not enable_offset_nerf_grad:
        xyzs = jax.lax.stop_gradient(xyzs)

    d = dirs / jnp.linalg.norm(dirs, axis=-1, keepdims=True)
    flat_x = xyzs.reshape(-1, 3)
    flat_d = d.reshape(-1, 3)
    if shell_k > 1 and shading in ("full", "diffuse"):
        # Thin-shell composite (round-5): the single point sample at the
        # interpolated surface aliases against the stage-0 density ramp —
        # per-vertex placement error (mean ~0.01-0.03 ngp units, >> the
        # finest hash cell) radially displaces the query into field regions
        # volume rendering never constrained, which reads as triangle-scale
        # color speckle (round-5 v9 decomposition: 78-92% of held-out MSE
        # is INTERIOR).  Composite shell_k samples along the view ray
        # centered on the surface with the field's own transmittance
        # weights instead: the same estimator the stage-0 train loss
        # optimized, restricted to a shell_h-wide shell.  Weights are
        # stop-graded (the photometric loss trains color, not density —
        # reference stage-1 parity, renderer.py:877-887).
        from .network import field_forward
        K = int(shell_k)
        P = flat_x.shape[0]
        offs = jnp.linspace(-0.5 * shell_h, 0.5 * shell_h, K)
        full_flag = jnp.asarray(shading == "full")
        dt = shell_h / K

        # one field pass PER LAYER (lax.scan): the exact-encode intermediate
        # is [C, N, L, 8]; at N = P*K it exceeds HBM (K=4 on a 512^2
        # supersampled crop hit a 25.8 GB allocation).  Layer-wise keeps
        # peak memory at the single-sample level.
        def _layer(carry, off):
            T, acc, wsum, acc_u = carry
            pts = flat_x + off * flat_d
            sig, col, _, _ = field_forward(params, pts, flat_d, net_spec,
                                           full_flag, ind_code)
            a = 1.0 - jnp.exp(-jnp.maximum(sig, 0.0) * dt)
            w = jax.lax.stop_gradient(T * a)
            acc = acc + w[:, None] * col
            wsum = wsum + w
            T = T * jax.lax.stop_gradient(1.0 - a + 1e-7)
            acc_u = acc_u + col * (1.0 / K)
            return (T, acc, wsum, acc_u), None

        init = (jnp.ones((P,)), jnp.zeros((P, 3)), jnp.zeros((P,)),
                jnp.zeros((P, 3)))
        (_, acc, wsum, acc_u), _ = jax.lax.scan(_layer, init, offs)
        wsum = wsum[:, None]
        mean_c = acc / jnp.maximum(wsum, 1e-6)
        # open-shell fallback (culled/empty space): plain radial average
        colors = jnp.where(wsum > 0.05, mean_c, acc_u)
    else:
        colors, _ = field_rgb(params, flat_x, flat_d, net_spec, ind_code,
                              shading)
    rgbs = colors.reshape(Cs, Cs, 3)
    rgbs = jnp.where(rast["covered"][..., None], rgbs, 0.0)

    # alpha_mode (silhouette treatment):
    #   "area" — EXACT per-pixel union area coverage of the front surface
    #            (rasterizer frag_area).  Unbiased at the rim (the round-4
    #            oracle probe measured strict+AA under-covering by ~0.09
    #            alpha even with perfect geometry) and identical at train
    #            and eval — estimator parity by construction.  Dense
    #            analytic vertex gradients at every rim pixel.  The default.
    #   "aa"   — hard pixel-center coverage + analytic edge antialiasing
    #            (dr.antialias analog, reference parity renderer.py:884-887).
    #            Biased: the AA crossing truncates at the depth winner's
    #            edge, shaving foreshortened rim slivers.
    #   "hard" — binary pixel-center coverage, no blending.
    #   "soft" — signed-distance sigmoid ramp (~soft_px wide).  Round-1/2
    #            training mode; smears ~1.4 px of blend across every
    #            silhouette (measured 86% of stage-1 eval MSE vs hard GT).
    # NOTE "hard"/"aa" use STRICT coverage — `covered` also marks near-edge
    # outside winners (extrapolated rim pixels), which dilates silhouettes
    # outward by ~1px (the round-2 capstone's systematic rim error).
    if alpha_mode == "area":
        # VALUE: 4x4-subsample true union (immune to the fold double-
        # counting the area-sum suffers on real stage-1 meshes — round-4
        # oracle-v2 probe).  GRADIENT: the analytic area (dense, exact at
        # every rim fragment).  Straight-through composite.
        a_sum = rast["area"][..., None]
        alpha = a_sum + jax.lax.stop_gradient(
            rast["union"][..., None] - a_sum)
    elif alpha_mode in ("aa", "hard"):
        alpha = rast["strict"].astype(jnp.float32)[..., None]
    elif alpha_mode == "soft":
        alpha = rast["alpha"][..., None]
    else:
        raise ValueError(f"unknown alpha_mode {alpha_mode!r}")
    image = alpha * rgbs + (1.0 - alpha) * bg_color
    # white composite alongside: the train-time quality METRIC must match
    # the eval protocol (GT over white, render_image_stage1 bg=1) — the
    # random-bg PSNR systematically reads ~3 dB high because random bg
    # lowers the fg/bg contrast that rim errors multiply (round-3 Weak #3)
    image_w = alpha * rgbs + (1.0 - alpha)
    depth = alpha[..., 0] * rast["depth"]
    if alpha_mode == "aa":
        from .rasterizer import antialias
        rgba = antialias(
            jnp.concatenate([image, alpha, image_w], axis=-1), rast,
            crop_origin)
        image, alpha, image_w = rgba[..., :3], rgba[..., 3:4], rgba[..., 4:]
    weights_sum = alpha[..., 0]

    if s > 1:
        image = image.reshape(Cp, s, Cp, s, 3).mean(axis=(1, 3))
        image_w = image_w.reshape(Cp, s, Cp, s, 3).mean(axis=(1, 3))
        depth = depth.reshape(Cp, s, Cp, s).mean(axis=(1, 3))
        weights_sum = weights_sum.reshape(Cp, s, Cp, s).mean(axis=(1, 3))

    return {
        "image": image,
        "image_white": image_w,
        "depth": depth,
        "weights_sum": weights_sum,
        "trig_id": rast["tri_id"],
        "overflow": rast["overflow"],
        "n_live": rast["n_live"],
        "n_overlap": rast["n_overlap"],
    }


# ---------------- mesh regularizers (utils.py:116-221, 759-789) -------------

def _masked_mean(x: jax.Array, n_real, size: int) -> jax.Array:
    """Mean over the first n_real entries (traced) of a length-`size` vector;
    pad entries are masked so bucket-padded buffers don't skew the loss."""
    if n_real is None:
        return jnp.mean(x)
    m = (jnp.arange(size) < n_real).astype(x.dtype)
    return jnp.sum(x * m) / jnp.maximum(n_real.astype(x.dtype), 1.0)


def laplacian_loss(verts: jax.Array, edges: jax.Array,
                   degree: jax.Array, v_real=None, e_real=None) -> jax.Array:
    """Uniform laplacian smoothing: mean || v - mean(neighbors) ||
    (utils.py:190-221 laplacian_smooth_loss)."""
    w = (jnp.ones((edges.shape[0], 1), verts.dtype) if e_real is None
         else (jnp.arange(edges.shape[0]) < e_real)[:, None].astype(verts.dtype))
    acc = jnp.zeros_like(verts)
    acc = acc.at[edges[:, 0]].add(verts[edges[:, 1]] * w)
    acc = acc.at[edges[:, 1]].add(verts[edges[:, 0]] * w)
    lap = verts - acc / degree[:, None]
    # eps inside the sqrt: jnp's d|x|/dx is NaN at 0 (offsets start at exactly
    # zero on flat regions; torch's subgradient there is 0)
    return _masked_mean(jnp.sqrt(jnp.sum(lap * lap, axis=-1) + 1e-12),
                        v_real, verts.shape[0])


def normal_consistency_loss(verts: jax.Array, tris: jax.Array,
                            face_pairs: jax.Array, p_real=None) -> jax.Array:
    """1 - cos between adjacent face normals (pytorch3d
    mesh_normal_consistency analog, utils.py:763)."""
    v0 = verts[tris[:, 0]]
    n = jnp.cross(verts[tris[:, 1]] - v0, verts[tris[:, 2]] - v0)
    n = n * jax.lax.rsqrt(jnp.sum(n * n, axis=-1, keepdims=True) + 1e-20)
    na = n[face_pairs[:, 0]]
    nb = n[face_pairs[:, 1]]
    return _masked_mean(1.0 - jnp.abs(jnp.sum(na * nb, axis=-1)),
                        p_real, face_pairs.shape[0])


def edge_length_loss(verts: jax.Array, edges: jax.Array,
                     e_real=None) -> jax.Array:
    """Mean squared edge length (pytorch3d mesh_edge_loss analog)."""
    d = verts[edges[:, 0]] - verts[edges[:, 1]]
    return _masked_mean(jnp.sum(d * d, axis=-1), e_real, edges.shape[0])


def offsets_loss(offsets: jax.Array, v_inner, bound: float,
                 v_real=None) -> jax.Array:
    """L2 on offsets, 0.1x weight for outer-cascade vertices
    (utils.py:771-789).  v_inner may be a traced scalar (bucket-padded
    buffers keep shapes static across refines); pads beyond v_real are
    masked."""
    V = offsets.shape[0]
    sq = jnp.sum(offsets ** 2, axis=-1)
    if v_real is None and isinstance(v_inner, int):
        inner = sq[:v_inner]
        loss = jnp.mean(inner)
        if V > v_inner:
            loss = loss + 0.1 * jnp.mean(sq[v_inner:])
        return loss
    iota = jnp.arange(V)
    vi = jnp.asarray(v_inner)
    vr = jnp.asarray(V if v_real is None else v_real)
    in_m = (iota < vi).astype(sq.dtype)
    out_m = ((iota >= vi) & (iota < vr)).astype(sq.dtype)
    f32 = sq.dtype
    loss = jnp.sum(sq * in_m) / jnp.maximum(vi.astype(f32), 1.0)
    n_out = jnp.maximum((vr - vi).astype(f32), 1.0)
    return loss + 0.1 * jnp.sum(sq * out_m) / n_out


# ---------------- adaptive refinement (renderer.py:209-294) ------------------

def refine_and_decimate(
    mesh: Stage1Mesh,
    offsets: np.ndarray,
    errors: np.ndarray,            # [F] accumulated error
    counts: np.ndarray,            # [F]
    cfg,
    workspace: str,
    max_faces: int = 0,
) -> Stage1Mesh:
    """Percentile-driven decimate/subdivide of the inner mesh; writes
    mesh_{cas}_updated.ply and returns the rebuilt topology."""
    from ..meshing import meshops
    from ..meshing.io import write_ply

    v = (mesh.vertices + np.asarray(offsets)).astype(np.float32)
    f = mesh.triangles

    cnt_mask = counts > 0
    err = errors.copy()
    err[cnt_mask] = err[cnt_mask] / counts[cnt_mask]

    f1 = mesh.f_cumsum[1]
    err = err[:f1]
    cnt_mask = cnt_mask[:f1]

    # hard face budget (computed early: it caps the subdivide set)
    budget_all = max_faces if max_faces > 0 else (1 << 18)
    n_outer_f = mesh.f_cumsum[-1] - mesh.f_cumsum[1]

    if cfg.sdf or not cnt_mask.any():
        mask = np.ones_like(err)
        sub_ids_sorted = np.empty((0,), np.int64)
    else:
        thresh_refine = np.percentile(err[cnt_mask], 90)
        thresh_decimate = np.percentile(err[cnt_mask], 50)
        mask = np.zeros_like(err)
        mask[(err > thresh_refine) & cnt_mask] = 2
        mask[(err < thresh_decimate) & cnt_mask] = 1
        sub_ids = np.where(mask == 2)[0]
        sub_ids_sorted = sub_ids[np.argsort(err[sub_ids])[::-1]]

    out_dir = os.path.join(workspace, "mesh_stage0")
    os.makedirs(out_dir, exist_ok=True)

    cascades = len(mesh.v_cumsum) - 1
    # hard face budget: the rasterizer compacts crop-overlapping triangles
    # to K<=2^18 slots; a mesh larger than that guarantees dropped triangles
    # on object-filling crops (trainer._raster_spec)
    budget = budget_all
    n_outer = n_outer_f
    verts, tris = [], []
    v_cumsum, f_cumsum = [0], [0]
    for cas in range(cascades):
        cv = v[mesh.v_cumsum[cas]:mesh.v_cumsum[cas + 1]]
        cf = (f[mesh.f_cumsum[cas]:mesh.f_cumsum[cas + 1]]
              - mesh.v_cumsum[cas])
        if cas == 0:
            # multi-cascade scenes can have outer faces consuming most (or
            # more than) the budget — floor the inner share so decimate_mesh
            # never receives a non-positive target (ADVICE r3 #1)
            inner_budget = max(budget - int(n_outer), 1024)
            if budget - int(n_outer) < 1024:
                print(f"[refine_and_decimate] outer cascades use "
                      f"{int(n_outer)} of the {budget} face budget; flooring "
                      f"the inner budget at 1024")
            # overshooting the budget triggers a GLOBAL quadric decimate-
            # back that undoes the error-targeted refinement and churns
            # vertex placement mesh-wide (the v4/v5 capstones subdivided
            # +34-110k faces per refine and decimated straight back every
            # time; eval dipped 1-2 dB after each refine and spent ~300-450
            # steps healing).  Growth comes from BOTH the subdivide set
            # (x4 per face) and the remesh of the decimated region
            # (re-splits edges past 4/3*target), so cap by RETRY: shrink
            # the subdivide set (highest-error kept), then drop the remesh,
            # and only globally decimate as a last resort.
            freed = int(cfg.refine_decimate_ratio * (mask == 1).sum())
            allowed0 = max(int((inner_budget * 0.97 - len(cf) + freed) // 3),
                           0)
            attempts = [(allowed0, cfg.refine_remesh_size),
                        (allowed0 // 4, cfg.refine_remesh_size),
                        (allowed0 // 4, 0.0), (0, 0.0)]
            cv0, cf0 = cv, cf
            for allowed, remesh_size in attempts:
                m = mask.copy()
                if len(sub_ids_sorted) > allowed:
                    m[sub_ids_sorted] = 0
                    m[sub_ids_sorted[:allowed]] = 2
                cv, cf = meshops.decimate_and_refine_mesh(
                    cv0, cf0, m, decimate_ratio=cfg.refine_decimate_ratio,
                    refine_size=cfg.refine_size,
                    refine_remesh_size=remesh_size)
                if len(cf) <= inner_budget:
                    if (allowed, remesh_size) != attempts[0]:
                        print(f"[refine_and_decimate] fit the budget with "
                              f"subdiv={allowed} remesh={remesh_size} "
                              f"({len(cf)}/{inner_budget} faces)")
                    break
            if len(cf) > inner_budget:
                print(f"[refine_and_decimate] {len(cf)} inner faces exceed "
                      f"the raster budget {inner_budget}; decimating back")
                cv, cf = meshops.decimate_mesh(
                    cv, cf, target=int(inner_budget * 0.95))
        write_ply(os.path.join(out_dir, f"mesh_{cas}_updated.ply"), cv, cf)
        verts.append(cv)
        tris.append(cf + v_cumsum[-1])
        v_cumsum.append(v_cumsum[-1] + len(cv))
        f_cumsum.append(f_cumsum[-1] + len(cf))

    return Stage1Mesh(
        vertices=np.concatenate(verts).astype(np.float32),
        triangles=np.concatenate(tris).astype(np.int32),
        v_cumsum=np.asarray(v_cumsum), f_cumsum=np.asarray(f_cumsum),
    )
