"""Cross-entropy losses with mmdet reduction semantics.

reference: /root/reference/mmdet/models/losses/cross_entropy_loss.py
Notably the 'mean' reduction of the rank loss divides by the TOTAL element
count (ignored pixels contribute zero loss but still count in the
denominator) because mmdet applies ``ignore_index`` inside F.cross_entropy
then takes a plain mean.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp


def binary_cross_entropy_with_logits(logits: jax.Array, targets: jax.Array) -> jax.Array:
    t = targets.astype(logits.dtype)
    return (jnp.maximum(logits, 0.0) - logits * t
            + jnp.log1p(jnp.exp(-jnp.abs(logits))))


def masked_bce_mean(logits: jax.Array, targets: jax.Array,
                    mask: jax.Array) -> jax.Array:
    """Mean BCE over elements selected by mask (matches the reference's
    ``loss_mask(pred[mask], target[mask])``)."""
    loss = binary_cross_entropy_with_logits(logits.astype(jnp.float32), targets)
    m = mask.astype(jnp.float32)
    denom = jnp.maximum(m.sum(), 1.0)
    return (loss * m).sum() / denom


def softmax_ce_ignore(logits: jax.Array, labels: jax.Array,
                      ignore_index: int = 255) -> jax.Array:
    """Softmax CE over the channel axis with ignore_index; mean over ALL
    positions (mmdet convention — ignored positions contribute 0 to the
    numerator but are included in the denominator).

    Args:
      logits: (..., C) logits.
      labels: (...,) int labels.
    """
    c = logits.shape[-1]
    valid = (labels != ignore_index) & (labels >= 0) & (labels < c)
    safe_labels = jnp.where(valid, labels, 0)
    logp = jax.nn.log_softmax(logits.astype(jnp.float32), axis=-1)
    nll = -jnp.take_along_axis(logp, safe_labels[..., None], axis=-1)[..., 0]
    nll = jnp.where(valid, nll, 0.0)
    return nll.mean()
