"""NeRF/NeuS field networks (parity with reference nerf/network.py:57-207).

Architecture (identical to the reference):
  * density field:  hashgrid(level_dim=1, finest 2048*bound) -> concat(x) ->
    MLP(3+16 -> 32 -> 1, 2 layers, no bias) -> trunc_exp sigma (or raw SDF)
  * color field:    hashgrid(level_dim=2) -> concat(x [, ind_code]) ->
    MLP(-> 64^3 -> 3+specular_dim) -> sigmoid = [diffuse3 | spec-feat]
  * specular head:  MLP(3 dir + spec_dim -> 32 -> 3) -> sigmoid;
    full color = clamp(diffuse + specular, 0, 1)
  * SDF mode: learnable `variance` (NeuS inv-s), finite-difference normals,
    double-sphere pretraining init.

All functions are pure: params is a pytree dict, spec is static.
"""

from __future__ import annotations

from dataclasses import dataclass
from functools import partial
from typing import Any, Dict, Optional, Tuple

import jax
import jax.numpy as jnp

from ..ops.activation import trunc_exp
from ..ops.hashgrid import HashGridSpec, hashgrid_encode, init_hashgrid
from .mlp import apply_mlp, init_mlp

Params = Dict[str, Any]


@dataclass(frozen=True)
class NetworkSpec:
    bound: float = 1.0            # grid bound (2 when contracted)
    sdf: bool = False
    specular_dim: int = 3
    ind_dim: int = 0
    ind_num: int = 500
    fp16: bool = False            # bf16 compute for MLPs on TPU
    # One merged hash table serving both fields (channel 0 -> density MLP,
    # channels 1..2 -> color MLP).  The reference uses two separate encoders
    # (network.py:66,71); merging halves the gather traffic — the dominant
    # cost on TPU — while keeping the same functional split downstream.
    # Set separate_tables=True for reference-architecture parity.
    separate_tables: bool = False
    log2_hashmap_size: int = 19
    num_levels: int = 16
    # table indexing layout: "block512" groups the lattice into 8^3 windows
    # (hash at block granularity) so the Pallas windowed encoder can serve
    # full-size tables; "ref" matches the reference entry-hash exactly.
    grid_layout: str = "ref"
    # splat-encoder routing: levels evaluated by plain gather instead of the
    # window kernel (fine levels without 128-point locality; the trainer
    # probes per-level residual rates and rewires this between compiles).
    encode_gather_levels: Tuple[int, ...] = ()
    encode_resid_budget: int = 1 << 19
    # train-only unbiased 1-corner sampling on gather-routed levels (8x fewer
    # random table rows); eval paths keep exact trilinear interpolation
    encode_stochastic: bool = False
    # exact window-sorted kernel for fine levels: per-level sort by block
    # window id -> single-block splat matmuls + ~18% crossing-corner residual
    # (ops/splat_encode.py winsort).  Applied to levels ALSO present in
    # encode_gather_levels; stochastic takes precedence when enabled.
    encode_winsort_levels: Tuple[int, ...] = ()

    @property
    def density_grid_spec(self) -> HashGridSpec:
        return HashGridSpec(
            num_levels=self.num_levels,
            level_dim=1 if self.separate_tables else 3,
            log2_hashmap_size=self.log2_hashmap_size,
            desired_resolution=int(2048 * self.bound), interpolation="linear",
            layout=self.grid_layout,
        )

    @property
    def color_grid_spec(self) -> HashGridSpec:
        if not self.separate_tables:
            return self.density_grid_spec
        return HashGridSpec(
            num_levels=self.num_levels, level_dim=2,
            log2_hashmap_size=self.log2_hashmap_size,
            desired_resolution=int(2048 * self.bound), interpolation="linear",
            layout=self.grid_layout,
        )

    @property
    def density_feat_dim(self) -> int:
        return self.num_levels

    @property
    def color_feat_dim(self) -> int:
        return self.num_levels * 2

    @property
    def compute_dtype(self):
        return jnp.bfloat16 if self.fp16 else jnp.float32


def init_network(key: jax.Array, spec: NetworkSpec) -> Params:
    ks = jax.random.split(key, 8)
    dspec, cspec = spec.density_grid_spec, spec.color_grid_spec
    params: Params = {
        "sigma_net": init_mlp(ks[2], 3 + spec.density_feat_dim, 1, 32, 2,
                              bias=False),
        "color_net": init_mlp(
            ks[3], 3 + spec.color_feat_dim + spec.ind_dim,
            3 + spec.specular_dim, 64, 3, bias=False,
        ),
        "specular_net": init_mlp(ks[4], spec.specular_dim + 3, 3, 32, 2, bias=False),
    }
    if spec.separate_tables:
        params["sigma_table"] = init_hashgrid(ks[0], dspec)
        params["color_table"] = init_hashgrid(ks[1], cspec)
    else:
        params["table"] = init_hashgrid(ks[0], dspec)
    if spec.sdf:
        params["variance"] = jnp.asarray(0.3, jnp.float32)
    if spec.ind_dim > 0:
        params["individual_codes"] = (
            jax.random.normal(ks[5], (spec.ind_num, spec.ind_dim)) * 0.1
        )
    return params


def _use_splat(gspec) -> bool:
    import os
    from ..ops.splat_encode import splat_supported
    return (os.environ.get("NERF2MESH_SPLAT_ENCODER", "1") != "0"
            and splat_supported(gspec)
            and jax.default_backend() not in ("cpu",))


def _use_sweep(gspec) -> bool:
    import os
    from ..ops.pallas_encode import sweep_supported
    return (os.environ.get("NERF2MESH_SWEEP_ENCODER", "1") != "0"
            and sweep_supported(gspec)
            and jax.default_backend() not in ("cpu",))


def _mask_levels(h, max_level, gspec):
    if max_level is None:
        return h
    L, C = gspec.num_levels, gspec.level_dim
    mask = (jnp.arange(L) < max_level)[None, :, None]
    return (h.reshape(-1, L, C) * mask).reshape(-1, L * C)


def _encode(table, x01, gspec, max_level, spec: "NetworkSpec",
            pre_sorted: bool = False):
    """hashgrid encode, routed by table spec and backend:
      * block512 layouts on TPU -> splat-contraction Pallas encoder with
        per-level kernel/gather routing (ops/splat_encode.py);
      * small tables on TPU -> VMEM-sweep kernel (ops/pallas_encode.py);
      * otherwise the XLA gather path.
    Returns (features, per-level residual counts | None)."""
    if _use_splat(gspec):
        from ..ops.splat_encode import splat_encode
        h, cnt = splat_encode(
            table, x01, gspec,
            resid_budget=spec.encode_resid_budget,
            sort=not pre_sorted,
            gather_levels=spec.encode_gather_levels,
            stochastic=spec.encode_stochastic,
            winsort_levels=(() if spec.encode_stochastic
                            else spec.encode_winsort_levels))
        return _mask_levels(h, max_level, gspec), cnt
    if _use_sweep(gspec):
        from ..ops.pallas_encode import sweep_encode
        # ~36x faster forward than the XLA gather path for qualifying specs
        # (log2_hashmap_size <= 14); backward is XLA scatters (PERF.md).
        return _mask_levels(sweep_encode(table, x01, gspec),
                            max_level, gspec), None
    return hashgrid_encode(table, x01, gspec, max_level), None


def encode_fields(params: Params, x01: jax.Array, spec: NetworkSpec,
                  max_level: Optional[jax.Array] = None,
                  pre_sorted: bool = False):
    """One pass over the hash table(s) -> (density feats [N,L], color feats
    [N,2L], encode resid counts [L]|None).  In merged mode both come from a
    single C=3 encode — the gather traffic (the TPU bottleneck) is paid once
    for both fields."""
    L = spec.num_levels
    if spec.separate_tables:
        hd, c1 = _encode(params["sigma_table"], x01, spec.density_grid_spec,
                         max_level, spec, pre_sorted)
        hc, c2 = _encode(params["color_table"], x01, spec.color_grid_spec,
                         max_level, spec, pre_sorted)
        cnt = None if c1 is None else c1 + (0 if c2 is None else c2)
        return hd, hc, cnt
    h, cnt = _encode(params["table"], x01, spec.density_grid_spec, max_level,
                     spec, pre_sorted)
    h = h.reshape(x01.shape[0], L, 3)
    return h[:, :, 0], h[:, :, 1:].reshape(x01.shape[0], 2 * L), cnt


def _density_from_feat(params, x, hd, spec: NetworkSpec):
    h = jnp.concatenate([x.astype(jnp.float32), hd], axis=-1)
    h = apply_mlp(params["sigma_net"], h, compute_dtype=spec.compute_dtype)
    if spec.sdf:
        return h[..., 0]
    return trunc_exp(h[..., 0])


def _geo_feat_from_feat(params, x, hc, spec: NetworkSpec, c=None):
    h = jnp.concatenate([x.astype(jnp.float32), hc], axis=-1)
    if c is not None:
        if c.shape[0] == 1:
            c = jnp.broadcast_to(c, (x.shape[0], c.shape[-1]))
        h = jnp.concatenate([h, c], axis=-1)
    h = apply_mlp(params["color_net"], h, compute_dtype=spec.compute_dtype)
    return jax.nn.sigmoid(h)


@partial(jax.jit, static_argnames=("spec",))
def density(params: Params, x: jax.Array, spec: NetworkSpec,
            max_level: Optional[jax.Array] = None) -> jax.Array:
    """sigma (after trunc_exp) or raw SDF value. x: [N, 3] in [-bound, bound]."""
    x01 = (x + spec.bound) / (2 * spec.bound)
    if _use_splat(spec.density_grid_spec):
        # hoist the morton sort around the whole field: encode locality from
        # sorted points, one narrow (W=1) unsort of sigma instead of a wide
        # (W=L*C) unsort of features
        from ..ops.splat_encode import morton_perm, permute
        perm, inv = morton_perm(x01)
        xs = permute(x, perm, inv)
        hd, _, _ = encode_fields(params, (xs + spec.bound) / (2 * spec.bound),
                                 spec, max_level, pre_sorted=True)
        sig = _density_from_feat(params, xs, hd, spec)
        return permute(sig, inv, perm)
    hd, _, _ = encode_fields(params, x01, spec, max_level)
    return _density_from_feat(params, x, hd, spec)


@partial(jax.jit, static_argnames=("spec",))
def geo_feat(params: Params, x: jax.Array, spec: NetworkSpec,
             c: Optional[jax.Array] = None,
             max_level: Optional[jax.Array] = None) -> jax.Array:
    """sigmoid(color_net(...)) = [diffuse3 | spec-feat] (network.py:159-168)."""
    x01 = (x + spec.bound) / (2 * spec.bound)
    _, hc, _ = encode_fields(params, x01, spec, max_level)
    return _geo_feat_from_feat(params, x, hc, spec, c)


@partial(jax.jit, static_argnames=("spec",))
def field_forward(params: Params, x: jax.Array, d: jax.Array, spec: NetworkSpec,
                  full_flag: jax.Array, c: Optional[jax.Array] = None,
                  max_level: Optional[jax.Array] = None):
    """Hot-path forward: ONE hash-table pass -> (sigma, color, specular).

    full_flag is the traced diffuse/full shading switch (see rgb_train).
    Equivalent to the reference's self(xyzs, dirs, ...) (network.py:81-89) but
    with the two encoder passes fused into one gather sweep.

    Returns (sigma [N], color [N,3], specular [N,3], encode resid counts
    [L]|None — the splat-encoder routing probe signal).
    """
    splat = _use_splat(spec.density_grid_spec)
    if splat:
        # sort the whole field pipeline; unsort only the narrow outputs
        from ..ops.splat_encode import morton_perm, permute
        x01 = (x + spec.bound) / (2 * spec.bound)
        perm, inv = morton_perm(x01)
        x = permute(x, perm, inv)
        d = permute(d, perm, inv)
        if c is not None and c.shape[0] == x.shape[0]:
            c = permute(c, perm, inv)

    x01 = (x + spec.bound) / (2 * spec.bound)
    hd, hc, cnt = encode_fields(params, x01, spec, max_level,
                                pre_sorted=splat)
    sigma = _density_from_feat(params, x, hd, spec)
    gf = _geo_feat_from_feat(params, x, hc, spec, c)
    diffuse = gf[..., :3]
    spec_in = jnp.concatenate([d.astype(jnp.float32), gf[..., 3:]], axis=-1)
    specular = jax.nn.sigmoid(
        apply_mlp(params["specular_net"], spec_in, compute_dtype=spec.compute_dtype)
    )
    full = jnp.clip(diffuse + specular, 0.0, 1.0)
    color = jnp.where(full_flag, full, diffuse)
    specular = jnp.where(full_flag, specular, jnp.zeros_like(specular))

    if splat:
        packed = jnp.concatenate(
            [sigma[:, None], color, specular], axis=-1)          # [N, 7]
        packed = permute(packed, inv, perm)
        sigma, color, specular = packed[:, 0], packed[:, 1:4], packed[:, 4:7]
    return sigma, color, specular, cnt


@partial(jax.jit, static_argnames=("spec", "shading"))
def rgb(params: Params, x: jax.Array, d: jax.Array, spec: NetworkSpec,
        c: Optional[jax.Array] = None, shading: str = "full",
        max_level: Optional[jax.Array] = None) -> Tuple[jax.Array, Optional[jax.Array]]:
    """color [N,3], specular [N,3]|None (network.py:171-189).
    d must be normalized; identity dir encoding (encoder_dir='None')."""
    gf = geo_feat(params, x, spec, c, max_level)
    diffuse = gf[..., :3]
    if shading == "diffuse":
        return diffuse, None
    spec_in = jnp.concatenate([d.astype(jnp.float32), gf[..., 3:]], axis=-1)
    specular = jax.nn.sigmoid(
        apply_mlp(params["specular_net"], spec_in, compute_dtype=spec.compute_dtype)
    )
    if shading == "specular":
        return specular, specular
    return jnp.clip(diffuse + specular, 0.0, 1.0), specular


@partial(jax.jit, static_argnames=("spec",))
def rgb_train(params: Params, x: jax.Array, d: jax.Array, spec: NetworkSpec,
              full_flag: jax.Array, c: Optional[jax.Array] = None,
              max_level: Optional[jax.Array] = None) -> Tuple[jax.Array, jax.Array]:
    """Training-time color with a *traced* diffuse/full switch.

    The reference switches shading='diffuse' -> 'full' at diffuse_step
    (utils.py:670-674); making the switch a traced scalar keeps one compiled
    train step for the whole run.  `where` selection zeroes specular-path
    gradients during the diffuse warmup, matching the reference's behavior of
    not exercising the specular net then.
    """
    gf = geo_feat(params, x, spec, c, max_level)
    diffuse = gf[..., :3]
    spec_in = jnp.concatenate([d.astype(jnp.float32), gf[..., 3:]], axis=-1)
    specular = jax.nn.sigmoid(
        apply_mlp(params["specular_net"], spec_in, compute_dtype=spec.compute_dtype)
    )
    full = jnp.clip(diffuse + specular, 0.0, 1.0)
    color = jnp.where(full_flag, full, diffuse)
    specular = jnp.where(full_flag, specular, jnp.zeros_like(specular))
    return color, specular


@partial(jax.jit, static_argnames=("spec",))
def finite_diff_normal(params: Params, x: jax.Array, spec: NetworkSpec,
                       epsilon=1e-4,
                       max_level: Optional[jax.Array] = None) -> jax.Array:
    """Central-difference SDF normal (network.py:135-156); 6 density queries.
    epsilon may be a traced scalar (the reference anneals it, utils.py:652)."""
    b = spec.bound
    epsilon = jnp.asarray(epsilon, jnp.float32)
    signs = jnp.asarray(
        [[1, 0, 0], [-1, 0, 0], [0, 1, 0], [0, -1, 0], [0, 0, 1], [0, 0, -1]],
        dtype=jnp.float32)
    offsets = signs * epsilon
    xs = jnp.clip(x[None, :, :] + offsets[:, None, :], -b, b)   # [6, N, 3]
    vals = density(params, xs.reshape(-1, 3), spec, max_level).reshape(6, -1)
    return jnp.stack(
        [0.5 * (vals[0] - vals[1]) / epsilon,
         0.5 * (vals[2] - vals[3]) / epsilon,
         0.5 * (vals[4] - vals[5]) / epsilon], axis=-1)


def sdf_pretrain_loss(params: Params, key: jax.Array, spec: NetworkSpec,
                      r1: float = 0.5, r2: float = 1.5,
                      batch_size: int = 8192) -> jax.Array:
    """Double-sphere SDF pretraining target (network.py:111-131)."""
    b = spec.bound
    xyzs = jax.random.uniform(key, (batch_size, 3), minval=-b, maxval=b)
    d = jnp.linalg.norm(xyzs, axis=-1)
    gt = jnp.where(d < (r1 + r2) / 2, d - r1, r2 - d)
    pred = density(params, xyzs, spec)
    return jnp.mean((pred - gt) ** 2)
