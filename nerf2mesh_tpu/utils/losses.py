"""Loss functions (parity target: reference loss.py:1-25 — MAPE and Huber are
defined there but unused by the default pipeline, whose criterion is MSE
(main.py:187); kept for user configs)."""

from __future__ import annotations

import jax
import jax.numpy as jnp


def mse_loss(pred, gt):
    return (pred - gt) ** 2


def mape_loss(pred, gt, eps: float = 1e-2):
    """Mean absolute percentage error with stop-grad denominator
    (reference loss.py:4-12)."""
    diff = jnp.abs(pred - gt)
    scale = 1.0 / (jax.lax.stop_gradient(jnp.abs(gt)) + eps)
    return diff * scale


def huber_loss(pred, gt, delta: float = 0.1):
    """Huber / smooth-L1 (reference loss.py:15-25)."""
    err = jnp.abs(pred - gt)
    quad = 0.5 * err * err / delta
    lin = err - 0.5 * delta
    return jnp.where(err <= delta, quad, lin)


CRITERIA = {"mse": mse_loss, "mape": mape_loss, "huber": huber_loss}


# ----------------------------- perceptual loss -------------------------------
#
# The reference's --lambda_lpips uses lpips.LPIPS(net='vgg') on stage-1 crops
# (main.py:198-199, utils.py:1044-1049).  Pretrained VGG weights are not
# available offline, so this is a weight-free analog built on the same recipe
# LPIPS formalized: multi-scale conv features, unit-normalized along channels,
# MSE in feature space.  Random (fixed-seed, orthogonal-ish) conv filters are a
# documented, surprisingly strong substitute for pretrained features in
# perceptual metrics; deterministic across runs so it is a stable training
# signal.

_PERC_CHANNELS = (16, 32, 64)
_PERC_SEED = 1234


def _perceptual_filters():
    """Fixed random 3x3 conv stacks [(3->16), (16->32), (32->64)]."""
    key = jax.random.PRNGKey(_PERC_SEED)
    cin = 3
    filters = []
    for cout in _PERC_CHANNELS:
        key, sub = jax.random.split(key)
        w = jax.random.normal(sub, (3, 3, cin, cout), jnp.float32)
        w = w / jnp.sqrt(9.0 * cin)
        filters.append(w)
        cin = cout
    return filters


def _perceptual_features(img: jax.Array) -> list:
    """img [H, W, 3] in [0,1] -> list of channel-normalized feature maps."""
    x = (img[None] - 0.5) * 2.0                       # NHWC, [-1, 1]
    feats = []
    for w in _perceptual_filters():
        x = jax.lax.conv_general_dilated(
            x, w, window_strides=(2, 2), padding="SAME",
            dimension_numbers=("NHWC", "HWIO", "NHWC"))
        x = jax.nn.relu(x)
        n = x * jax.lax.rsqrt(jnp.sum(x * x, axis=-1, keepdims=True) + 1e-8)
        feats.append(n)
    return feats


def perceptual_loss(pred: jax.Array, gt: jax.Array) -> jax.Array:
    """LPIPS-style distance between two [H, W, 3] images in [0,1]."""
    fp = _perceptual_features(pred)
    fg = _perceptual_features(jax.lax.stop_gradient(gt))
    terms = [jnp.mean(jnp.sum((a - b) ** 2, axis=-1)) for a, b in zip(fp, fg)]
    return sum(terms) / len(terms)
