"""Hungarian assignment costs + matching, batched and on-device.

reference: /root/reference/polyphonic/funcs/assigner.py (FocalLossCost from
mmdet, MaskCost, DiceCost; MaskHungarianAssignerWithDepth with shipped
weights cls=2, dice=4, mask=1, depth=0 —
configs/_base_/models/polyphonic_former.py:168-196).

All costs are einsums over (num_preds, num_gt) pairs — MXU-friendly — and
the matcher (ops/hungarian.py) runs inside the jitted step, eliminating the
reference's 4x per-image device->host scipy syncs.
"""
from __future__ import annotations

from typing import NamedTuple, Optional

import jax
import jax.numpy as jnp

from ..configs import AssignerConfig
from ..data.structures import GTSample
from ..ops.hungarian import gt2pred_to_assignment, match_gt_to_preds


def focal_cls_cost(cls_logits: jax.Array, gt_labels: jax.Array,
                   gamma: float = 2.0, alpha: float = 0.25,
                   eps: float = 1e-12) -> jax.Array:
    """mmdet FocalLossCost. cls_logits: (N, C); gt_labels: (M,) clipped to
    valid class range by the caller. Returns (N, M)."""
    p = jax.nn.sigmoid(cls_logits.astype(jnp.float32))
    neg_cost = -jnp.log(1 - p + eps) * (1 - alpha) * jnp.power(p, gamma)
    pos_cost = -jnp.log(p + eps) * alpha * jnp.power(1 - p, gamma)
    cost = pos_cost - neg_cost  # (N, C)
    safe_labels = jnp.clip(gt_labels, 0, cls_logits.shape[1] - 1)
    return cost[:, safe_labels]


def mask_cost(mask_logits: jax.Array, gt_masks: jax.Array,
              gt_valid_pixels: Optional[jax.Array]) -> jax.Array:
    """reference MaskCost (assigner.py:151-194): -(pos + neg agreement)/norm."""
    p = jax.nn.sigmoid(mask_logits.astype(jnp.float32))
    t = gt_masks.astype(jnp.float32)
    if gt_valid_pixels is not None:
        v = gt_valid_pixels.astype(jnp.float32)
        pos = jnp.einsum("nhw,mhw,hw->nm", p, t, v)
        neg = jnp.einsum("nhw,mhw,hw->nm", 1 - p, 1 - t, v)
        return -(pos + neg) / jnp.maximum(v.sum(), 1.0)
    pos = jnp.einsum("nhw,mhw->nm", p, t)
    neg = jnp.einsum("nhw,mhw->nm", 1 - p, 1 - t)
    h, w = mask_logits.shape[-2:]
    return -(pos + neg) / (h * w)


def dice_cost(mask_logits: jax.Array, gt_masks: jax.Array,
              gt_valid_pixels: Optional[jax.Array], eps: float = 1e-3) -> jax.Array:
    """reference DiceCost (assigner.py:83-148): -2a/(b+c)."""
    p = jax.nn.sigmoid(mask_logits.astype(jnp.float32)).reshape(mask_logits.shape[0], -1)
    t = gt_masks.astype(jnp.float32).reshape(gt_masks.shape[0], -1)
    if gt_valid_pixels is not None:
        v = gt_valid_pixels.astype(jnp.float32).reshape(-1)
        a = jnp.einsum("nh,mh,h->nm", p, t, v)
        b = jnp.sum(p * p * v, axis=1) + eps
        c = jnp.sum(t * t * v, axis=1) + eps
    else:
        a = jnp.einsum("nh,mh->nm", p, t)
        b = jnp.sum(p * p, axis=1) + eps
        c = jnp.sum(t * t, axis=1) + eps
    return -(2 * a) / (b[:, None] + c[None, :])


class AssignResult(NamedTuple):
    pred2gt: jax.Array  # (P,) int32, index into thing slots, -1 = background
    gt2pred: jax.Array  # (M,) int32, -1 = invalid gt


def assign_masks(cfg: AssignerConfig,
                 mask_logits: jax.Array,
                 cls_logits: Optional[jax.Array],
                 gt: GTSample,
                 use_valid_pixels: bool = True) -> AssignResult:
    """Per-image Hungarian assignment of thing GTs to prediction rows.

    mask_logits: (P, h, w) detached mask logits (stride-4 scaled, like the
    reference's ``scaled_mask_preds``); cls_logits: (P, num_things) or None.
    """
    v = gt.valid_mask if use_valid_pixels else None
    cost = cfg.mask_weight * mask_cost(mask_logits, gt.thing_masks, v)
    cost = cost + cfg.dice_weight * dice_cost(mask_logits, gt.thing_masks, v)
    if cls_logits is not None and cfg.cls_weight != 0:
        cost = cost + cfg.cls_weight * focal_cls_cost(
            cls_logits, gt.thing_labels, cfg.focal_gamma, cfg.focal_alpha)
    # rows = gt, cols = preds
    gt2pred = match_gt_to_preds(cost.T, gt.thing_valid)
    pred2gt = gt2pred_to_assignment(gt2pred, mask_logits.shape[0])
    return AssignResult(pred2gt=pred2gt, gt2pred=gt2pred)
