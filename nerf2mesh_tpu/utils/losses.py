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
