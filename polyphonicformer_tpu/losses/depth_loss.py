"""Three-term depth loss (scale-invariant log + sqrt-squared-relative +
absolute-relative), matching the reference exactly.

reference: /root/reference/polyphonic/losses/depth_loss.py:9-65.  The torch
version masks to ``(0 < target < 80) & (weight != 0)``, multiplies the soft
mask weight into the residuals, and normalizes by the masked point count;
the final loss is ``loss_weight * mean(si*w_si, sq*w_sq, abs*w_abs)``.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp

from ..ops.depth import depth_act


def depth_loss_raw(pred_depth: jax.Array, target: jax.Array,
                   mask_weight: jax.Array,
                   min_depth: float = 0.0, max_depth: float = 80.0) -> jax.Array:
    """Returns the (3,) vector [si_err, sq_rel_err, abs_rel_err].

    pred_depth must already be activated (metric depth). All args same shape.
    """
    pred = pred_depth.astype(jnp.float32).reshape(-1)
    t = target.astype(jnp.float32).reshape(-1)
    w = mask_weight.astype(jnp.float32).reshape(-1)
    mask = (t > min_depth) & (t < max_depth) & (w != 0)
    mf = mask.astype(jnp.float32)
    n = mf.sum()
    safe_t = jnp.where(mask, t, 1.0)
    safe_p = jnp.where(mask, pred, 1.0)
    log_minus = (jnp.log(safe_p) - jnp.log(safe_t)) * w * mf
    minus = (safe_p - safe_t) * w * mf
    n_safe = jnp.maximum(n, 1.0)
    si_err = jnp.sum(jnp.square(log_minus)) / n_safe - jnp.sum(log_minus) / (n_safe * n_safe)
    sq_rel = jnp.sqrt(jnp.maximum(jnp.sum(jnp.square(minus / safe_t)) / n_safe, 1e-20))
    abs_rel = jnp.sum(jnp.abs(minus / safe_t)) / n_safe
    out = jnp.stack([si_err, sq_rel, abs_rel])
    # if no valid point at all, the reference returns zeros
    return jnp.where(n > 0, out, jnp.zeros_like(out))


def depth_loss_raw_stacked(pred_depth: jax.Array, target: jax.Array,
                           mask_weight: jax.Array, min_depth: float = 0.0,
                           max_depth: float = 80.0) -> jax.Array:
    """``depth_loss_raw`` for S independent problems stacked on axis 0 —
    each stage's reduction set is identical to the unstacked call, but the
    S problems share one pass of elementwise work.  Returns (S, 3)."""
    s = pred_depth.shape[0]
    pred = pred_depth.astype(jnp.float32).reshape(s, -1)
    t = target.astype(jnp.float32).reshape(s, -1)
    w = mask_weight.astype(jnp.float32).reshape(s, -1)
    mask = (t > min_depth) & (t < max_depth) & (w != 0)
    mf = mask.astype(jnp.float32)
    n = mf.sum(axis=1)  # (S,)
    safe_t = jnp.where(mask, t, 1.0)
    safe_p = jnp.where(mask, pred, 1.0)
    log_minus = (jnp.log(safe_p) - jnp.log(safe_t)) * w * mf
    minus = (safe_p - safe_t) * w * mf
    n_safe = jnp.maximum(n, 1.0)
    si_err = (jnp.sum(jnp.square(log_minus), axis=1) / n_safe
              - jnp.sum(log_minus, axis=1) / (n_safe * n_safe))
    sq_rel = jnp.sqrt(jnp.maximum(
        jnp.sum(jnp.square(minus / safe_t), axis=1) / n_safe, 1e-20))
    abs_rel = jnp.sum(jnp.abs(minus / safe_t), axis=1) / n_safe
    out = jnp.stack([si_err, sq_rel, abs_rel], axis=1)  # (S, 3)
    return jnp.where((n > 0)[:, None], out, jnp.zeros_like(out))


def depth_loss_stacked(pred_logits: jax.Array, target: jax.Array,
                       mask_weight: jax.Array, loss_weight: float = 1.0,
                       depth_act_mode: str = "sigmoid", si_weight: float = 1.0,
                       sq_rel_weight: float = 1.0,
                       abs_rel_weight: float = 1.0) -> jax.Array:
    """``depth_loss`` over S stacked problems; returns (S,)."""
    pred = depth_act(pred_logits, mode=depth_act_mode)
    errs = depth_loss_raw_stacked(pred, target, mask_weight)
    weights = jnp.asarray([si_weight, sq_rel_weight, abs_rel_weight],
                          jnp.float32)
    return loss_weight * (errs * weights[None]).mean(axis=1)


def depth_loss(pred_logits: jax.Array, target: jax.Array, mask_weight: jax.Array,
               loss_weight: float = 1.0, depth_act_mode: str = "sigmoid",
               si_weight: float = 1.0, sq_rel_weight: float = 1.0,
               abs_rel_weight: float = 1.0) -> jax.Array:
    """Full DepthLoss.forward equivalent: activates the raw logits, computes
    the three error terms, applies per-term weights and mean-reduces."""
    pred = depth_act(pred_logits, mode=depth_act_mode)
    errs = depth_loss_raw(pred, target, mask_weight)
    weights = jnp.asarray([si_weight, sq_rel_weight, abs_rel_weight], jnp.float32)
    return loss_weight * (errs * weights).mean()
