"""Sigmoid focal loss with mmcv/mmdet semantics.

reference: /root/reference/mmdet/models/losses/focal_loss.py:12-58 (the CUDA
kernel computes the same math as py_sigmoid_focal_loss with one-hot targets).
On TPU this is pure elementwise math that XLA fuses — no custom kernel needed.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp


def sigmoid_focal_loss_elements(logits: jax.Array, onehot: jax.Array,
                                gamma: float = 2.0,
                                alpha: float = 0.25) -> jax.Array:
    """Per-element focal loss. logits/onehot: (..., C)."""
    p = jax.nn.sigmoid(logits)
    t = onehot.astype(logits.dtype)
    pt = (1.0 - p) * t + p * (1.0 - t)
    focal_weight = (alpha * t + (1.0 - alpha) * (1.0 - t)) * jnp.power(pt, gamma)
    # bce with logits, numerically stable
    bce = jnp.maximum(logits, 0.0) - logits * t + jnp.log1p(jnp.exp(-jnp.abs(logits)))
    return bce * focal_weight


def sigmoid_focal_loss(logits: jax.Array, labels: jax.Array,
                       weight: jax.Array | None = None,
                       avg_factor: jax.Array | float | None = None,
                       gamma: float = 2.0, alpha: float = 0.25,
                       num_classes: int | None = None) -> jax.Array:
    """Focal loss over integer labels.

    Args:
      logits: (N, C).
      labels: (N,) int; label == C means background (all-negative row).
      weight: per-sample (N,) or per-element (N, C) weights.
      avg_factor: normalizer; if None uses mean over all elements.
    """
    n, c = logits.shape
    onehot = jax.nn.one_hot(labels, c + 1, dtype=logits.dtype)[:, :c]
    loss = sigmoid_focal_loss_elements(logits, onehot, gamma, alpha)
    if weight is not None:
        if weight.ndim == 1:
            weight = weight[:, None]
        loss = loss * weight
    if avg_factor is None:
        return loss.mean()
    return loss.sum() / jnp.maximum(avg_factor, 1e-12)
