"""Tracking losses: multi-positive contrastive CE and hard-mined L2.

reference: /root/reference/polyphonic/video/qdtrack/losses/
  multipos_cross_entropy_loss.py:6-40  (logsumexp over all (neg - pos) pairs)
  l2_loss.py:75-110                    (neg:pos cap with hard mining)

Static-shape reformulation: rows/cols are padded to fixed capacity and
carry validity masks; padded entries are excluded from both the positive and
negative sets.  Hard mining with a data-dependent keep count is expressed as
"rank < k" over sorted costs instead of a dynamic topk.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp

_NEG_INF = -1e30


def multi_pos_cross_entropy(pred: jax.Array, target: jax.Array,
                            pair_valid: jax.Array,
                            row_valid: jax.Array) -> jax.Array:
    """Multi-positive contrastive loss.

    Args:
      pred: (K, R) similarity logits (dot products).
      target: (K, R) 0/1 match matrix.
      pair_valid: (K, R) bool, False for padded entries.
      row_valid: (K,) bool, False for padded rows.

    Returns scalar: sum_i w_i * loss_i / sum_i w_i where
    w_i = row has >=1 positive (matching the reference's weights/avg_factor).
    """
    pred = pred.astype(jnp.float32)
    is_pos = (target == 1) & pair_valid
    is_neg = (target == 0) & pair_valid
    # loss_i = logsumexp_{n in neg, p in pos} (x_n - x_p), with extra 0 term
    pos_vals = jnp.where(is_pos, pred, -_NEG_INF)  # +inf for non-pos
    neg_vals = jnp.where(is_neg, pred, _NEG_INF)  # -inf for non-neg
    # pairwise differences: (K, R_neg, R_pos)
    diff = neg_vals[:, :, None] - pos_vals[:, None, :]
    k = pred.shape[0]
    diff = diff.reshape(k, -1)
    diff = jnp.concatenate([diff, jnp.zeros((k, 1), jnp.float32)], axis=1)
    loss = jax.nn.logsumexp(diff, axis=1)
    weights = ((is_pos.sum(axis=1) > 0) & row_valid).astype(jnp.float32)
    avg_factor = jnp.maximum(weights.sum(), 1e-12)
    return (loss * weights).sum() / avg_factor


def l2_aux_loss(cos_dist: jax.Array, target: jax.Array, pair_valid: jax.Array,
                neg_pos_ub: int = 3, pos_margin: float = 0.0,
                neg_margin: float = 0.1, hard_mining: bool = True) -> jax.Array:
    """Hard-mined L2 auxiliary loss on cosine similarities."""
    pred = cos_dist.astype(jnp.float32)
    t = jnp.where(pair_valid, target, -1)
    is_pos = t == 1
    is_neg = t == 0
    if pos_margin > 0:
        pred = jnp.where(is_pos, pred - pos_margin, pred)
    if neg_margin > 0:
        pred = jnp.where(is_neg, pred - neg_margin, pred)
    pred = jnp.clip(pred, 0.0, 1.0)

    num_pos = is_pos.sum()
    num_neg = is_neg.sum()
    weight = pair_valid.astype(jnp.float32)
    if neg_pos_ub > 0:
        cap = num_pos * neg_pos_ub
        needs_cap = num_neg / (num_pos + 1) > neg_pos_ub
        if hard_mining:
            cost = jnp.where(is_neg, jnp.square(pred - t.astype(jnp.float32)), -1.0)
            flat = cost.reshape(-1)
            order = jnp.argsort(-flat)  # descending cost
            rank = jnp.zeros_like(order).at[order].set(jnp.arange(flat.shape[0]))
            keep_neg = (rank < cap).reshape(cost.shape)
        else:
            keep_neg = is_neg  # random choice not supported in jit; hard
            # mining is what the shipped config uses
        drop = is_neg & ~keep_neg & needs_cap
        weight = jnp.where(drop, 0.0, weight)
    tt = jnp.where(is_pos, 1.0, 0.0)
    loss = jnp.square(pred - tt) * weight * (is_pos | is_neg).astype(jnp.float32)
    avg_factor = jnp.maximum((weight * (is_pos | is_neg)).sum(), 1e-12)
    return loss.sum() / avg_factor
