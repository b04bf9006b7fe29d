"""Dice loss with mmdet semantics (activate=True, eps=1e-3).

reference: /root/reference/mmdet/models/losses/dice_loss.py:9-46
"""
from __future__ import annotations

import jax
import jax.numpy as jnp


def dice_loss_per_row(pred_logits: jax.Array, target: jax.Array,
                      pixel_mask: jax.Array | None = None,
                      eps: float = 1e-3) -> jax.Array:
    """Dice loss per row.

    Args:
      pred_logits: (N, ...) mask logits (sigmoid applied inside).
      target: (N, ...) targets in [0, 1].
      pixel_mask: optional (N, ...) or broadcastable 0/1 mask restricting the
        loss to valid pixels (the reference indexes ``pos_mask_weights``
        before computing dice, which is equivalent to zeroing masked pixels
        in both pred and target).
    Returns: (N,) loss per row.
    """
    p = jax.nn.sigmoid(pred_logits.astype(jnp.float32))
    t = target.astype(jnp.float32)
    if pixel_mask is not None:
        m = pixel_mask.astype(jnp.float32)
        p = p * m
        t = t * m
    p = p.reshape(p.shape[0], -1)
    t = t.reshape(t.shape[0], -1)
    a = jnp.sum(p * t, axis=1)
    b = jnp.sum(p * p, axis=1) + eps
    c = jnp.sum(t * t, axis=1) + eps
    return 1.0 - (2.0 * a) / (b + c)
