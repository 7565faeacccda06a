"""Byte-level mlp.json contract check against the REFERENCE web viewer.

The reference renderer.html cannot run here (its three.js imports need
network egress), so this test ports its consumption logic to numpy,
verbatim from the HTML source, and asserts that evaluating OUR exported
mlp.json through the REFERENCE pipeline reproduces our specular network:

  * createNetworkWeightTexture (renderer.html:164-196): column-major
    repack of net.{l}.weight ([in][out] lists) into RGBA float texel rows,
    width padded to the next multiple of 4 (adds a full 4 when already
    divisible — the JS `width + (4 - width % 4)` quirk);
  * evaluateNetwork GLSL (renderer.html:80-161): input order
    [viewdir.xyz, f0.rgb] (inputFetch, renderer.html:69-79), first layer as
    row-vector x mat4-of-texel-columns blocks, relu, second layer blocks of
    texel triples, sigmoid;
  * full-mode composition clamp(diffuse + specular) (renderer.html:155).
"""

import json
import os

import numpy as np


def _weight_texture(W):  # noqa: N803 - mirrors the JS name
    """Port of createNetworkWeightTexture: returns texel array [T, 4]."""
    W = np.asarray(W, np.float32)          # [in, out] as listed in the json
    width, height = W.shape                # JS: width=in, height=out
    data = np.zeros(width * height, np.float32)
    for co in range(height):
        for ci in range(width):
            data[co * width + ci] = W[ci, co]
    width_pad = width + (4 - width % 4)    # NB: +4 even when width % 4 == 0
    pad = np.zeros(width_pad * height, np.float32)
    for j in range(0, width_pad, 4):
        for i in range(height):
            for c in range(4):
                if c + j < width:
                    pad[j * height + i * 4 + c] = data[j + i * width + c]
    return pad.reshape(-1, 4)              # texelFetch(tex, ivec2(0, r))


def _evaluate_network(w0_tex, w1_tex, hidden, f0, viewdir):
    """Port of the GLSL evaluateNetwork for one (f0 rgb, viewdir) pair."""
    # first layer: 6 -> hidden
    result_one = np.zeros(hidden, np.float32)
    v = np.array([viewdir[0], viewdir[1], viewdir[2], f0[0]], np.float32)
    for i in range(0, hidden, 4):
        w = w0_tex[i:i + 4]                # 4 texels = mat4 columns
        result_one[i:i + 4] += v @ w.T     # (v * w)[k] = dot(v, col_k)
    v = np.array([f0[1], f0[2], 0.0, 0.0], np.float32)
    for i in range(0, hidden, 4):
        w = w0_tex[hidden + i:hidden + i + 4]
        result_one[i:i + 4] += v @ w.T
    # second layer: hidden -> 3
    result = np.zeros(3, np.float32)
    for i in range(hidden // 4):
        v = np.maximum(result_one[4 * i:4 * i + 4], 0.0)
        w = np.zeros((4, 4), np.float32)
        w[:3] = w1_tex[i * 3:i * 3 + 3]    # columns 0..2; col 3 zero pad
        result += (v @ w.T)[:3]
    return 1.0 / (1.0 + np.exp(-result))


def test_mlp_json_reference_viewer_contract(tmp_path):
    import jax
    import jax.numpy as jnp

    from nerf2mesh_tpu.meshing.export import write_mlp_json
    from nerf2mesh_tpu.models.mlp import apply_mlp, init_mlp

    rng = np.random.default_rng(3)
    net = init_mlp(jax.random.PRNGKey(5), 6, 3, 32, 2, bias=False)

    path = write_mlp_json(net, bound=1.0, cascades=1, out_dir=str(tmp_path))
    mlp = json.load(open(path))

    # shape contract the viewer reads (renderer.html:200-202)
    assert len(mlp["net.0.weight"]) == 6          # channelsZero = in dim
    assert len(mlp["net.1.weight"]) == 32         # channelsOne = hidden
    assert len(mlp["net.1.weight"][0]) == 3       # channelsTwo = out dim
    assert mlp["cascade"] == 1 and mlp["bound"] == 1.0

    w0_tex = _weight_texture(mlp["net.0.weight"])
    w1_tex = _weight_texture(mlp["net.1.weight"])

    # random view dirs + jpg-quantized specular features, both pipelines
    dirs = rng.normal(size=(32, 3)).astype(np.float32)
    dirs /= np.linalg.norm(dirs, axis=-1, keepdims=True)
    feats = np.round(rng.uniform(size=(32, 3)) * 255) / 255.0

    ours = np.asarray(jax.nn.sigmoid(apply_mlp(
        net, jnp.asarray(np.concatenate([dirs, feats], -1), np.float32))))

    theirs = np.stack([
        _evaluate_network(w0_tex, w1_tex, 32, feats[i], dirs[i])
        for i in range(len(dirs))])

    np.testing.assert_allclose(theirs, ours, atol=2e-6)

    # full mode: clamp(diffuse + specular) (renderer.html:155) matches our
    # renderer's composition (models/network.py rgb: clip(diffuse+specular))
    diffuse = rng.uniform(size=(32, 3)).astype(np.float32)
    np.testing.assert_allclose(np.clip(diffuse + theirs, 0, 1),
                               np.clip(diffuse + ours, 0, 1), atol=2e-6)
