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


def depth_match_cost(depth_logits: jax.Array, gt_depth: jax.Array,
                     gt_masks: jax.Array, depth_act_mode: str = "sigmoid",
                     eps: float = 1e-5) -> jax.Array:
    """reference DepthCost/DepthMatchLoss (assigner.py:16-80): per (pred, gt)
    pair, 3-term depth error over the gt-mask region.  Shipped configs use
    weight 0; implemented for capability parity and ablations.

    depth_logits: (P, h, w) raw; gt_depth: (h, w); gt_masks: (M, h, w).
    Returns (P, M).
    """
    from ..ops.depth import depth_act

    pred = depth_act(depth_logits.astype(jnp.float32), depth_act_mode)
    tgt = gt_depth[None] * gt_masks  # (M, h, w)
    valid = (tgt > 0).astype(jnp.float32)  # (M, h, w)
    n_valid = jnp.maximum(valid.sum(axis=(1, 2)), 1e-3)  # (M,)
    # masked inputs/targets per pair, + eps as in the reference
    pi = pred[:, None] * valid[None] + eps  # (P, M, h, w)
    ti = tgt[None] + eps
    log_minus = jnp.log(pi) - jnp.log(ti)
    minus = pi - ti
    si = (jnp.square(log_minus).sum((-1, -2)) / n_valid
          - log_minus.sum((-1, -2)) / jnp.square(n_valid))
    sq_rel = jnp.sqrt(jnp.maximum(
        jnp.square(minus / ti).sum((-1, -2)) / n_valid, 1e-20))
    abs_rel = jnp.abs(minus / ti).sum((-1, -2)) / n_valid
    return si + sq_rel + abs_rel


def mask_dice_costs_stacked(cfg: AssignerConfig, mask_logits: jax.Array,
                            gt: GTSample) -> jax.Array:
    """Weighted mask+dice cost for S stacked problems sharing one GT.

    mask_logits: (S, B, P, h, w) detached; returns (S, B, P, M).  Same
    values as ``assignment_cost`` (cls/depth terms excluded) computed with
    ONE (P, M)-producing contraction: the MaskCost negative term expands to
    ``sum(v) - sum(p v) - sum(t v) + sum(p t v)`` so the pos/neg/dice
    numerators all reuse the single p·t·v einsum.
    """
    p = jax.nn.sigmoid(mask_logits.astype(jnp.float32))
    t = gt.thing_masks.astype(jnp.float32)  # (B, M, h, w)
    v = gt.valid_mask.astype(jnp.float32)  # (B, h, w)
    ptv = jnp.einsum("sbphw,bmhw,bhw->sbpm", p, t, v)  # pos & dice numerator
    pv = jnp.einsum("sbphw,bhw->sbp", p, v)
    p2v = jnp.einsum("sbphw,sbphw,bhw->sbp", p, p, v)
    tv = jnp.einsum("bmhw,bhw->bm", t, v)
    t2v = jnp.einsum("bmhw,bmhw,bhw->bm", t, t, v)
    vsum = v.sum(axis=(1, 2))  # (B,)
    neg = (vsum[None, :, None, None] - pv[..., None]
           - tv[None, :, None] + ptv)
    mask_c = -(ptv + neg) / jnp.maximum(vsum, 1.0)[None, :, None, None]
    dice_c = -(2.0 * ptv) / ((p2v[..., None] + 1e-3)
                             + (t2v[None, :, None] + 1e-3))
    return cfg.mask_weight * mask_c + cfg.dice_weight * dice_c


class AssignResult(NamedTuple):
    pred2gt: jax.Array  # (P,) int32, index into thing slots, -1 = background
    gt2pred: jax.Array  # (M,) int32, -1 = invalid gt


def assignment_cost(cfg: AssignerConfig,
                    mask_logits: jax.Array,
                    cls_logits: Optional[jax.Array],
                    gt: GTSample,
                    use_valid_pixels: bool = True,
                    depth_logits: Optional[jax.Array] = None,
                    depth_act_mode: str = "sigmoid") -> jax.Array:
    """The (P, M) pairwise assignment cost (everything but the solve) —
    split out so callers can stack several problems and run ONE lockstep
    vmapped solve (the solver's serial while_loop dominates; see
    ops/hungarian.py)."""
    v = gt.valid_mask if use_valid_pixels else None
    cost = cfg.mask_weight * mask_cost(mask_logits, gt.thing_masks, v)
    cost = cost + cfg.dice_weight * dice_cost(mask_logits, gt.thing_masks, v)
    if cls_logits is not None and cfg.cls_weight != 0:
        cost = cost + cfg.cls_weight * focal_cls_cost(
            cls_logits, gt.thing_labels, cfg.focal_gamma, cfg.focal_alpha)
    if depth_logits is not None and cfg.depth_weight != 0:
        cost = cost + cfg.depth_weight * depth_match_cost(
            depth_logits, gt.depth, gt.thing_masks, depth_act_mode)
    return cost


def solve_assignment(cost: jax.Array, gt_valid: jax.Array,
                     num_preds: int, topk: int = 1) -> AssignResult:
    """cost: (P, M) pairwise cost; gt_valid: (M,).

    topk > 1 reproduces the reference's multi-round matching
    (funcs/assigner.py:330-344): after each Hungarian round the matched
    prediction ROWS are masked to 1e10 and the solve repeats, so each GT
    collects its ``topk`` best distinct prediction rows.  ``pred2gt`` merges
    all rounds (rounds are disjoint in pred rows); ``gt2pred`` is stacked
    (topk, M) when topk > 1, round 0 first (the best match).
    """
    if topk <= 1:
        gt2pred = match_gt_to_preds(cost.T, gt_valid)
        pred2gt = gt2pred_to_assignment(gt2pred, num_preds)
        return AssignResult(pred2gt=pred2gt, gt2pred=gt2pred)
    work = cost.astype(jnp.float32)
    g2p_rounds = []
    pred2gt = jnp.full((num_preds,), -1, jnp.int32)
    for _ in range(topk):
        g2p = match_gt_to_preds(work.T, gt_valid)
        p2g = gt2pred_to_assignment(g2p, num_preds)
        pred2gt = jnp.where(pred2gt < 0, p2g, pred2gt)
        g2p_rounds.append(g2p)
        work = jnp.where((p2g >= 0)[:, None], 1e10, work)
    return AssignResult(pred2gt=pred2gt, gt2pred=jnp.stack(g2p_rounds))


def solve_assignments_lockstep(costs: jax.Array, valids: jax.Array,
                               topk: int = 1) -> AssignResult:
    """Solve N independent assignment problems in lockstep.

    costs: (N, P, M); valids: (N, M).  Returns AssignResult with (N, ...)
    leaves.  topk == 1 routes through the batched matcher (one Pallas kernel
    on TPU, vmapped lax elsewhere — ops/hungarian.py); topk > 1 keeps the
    vmapped multi-round form.
    """
    if topk <= 1:
        from ..ops.hungarian import (gt2pred_to_assignment,
                                     match_gt_to_preds_batched)

        g2p = match_gt_to_preds_batched(jnp.swapaxes(costs, 1, 2), valids)
        p2g = jax.vmap(
            lambda g: gt2pred_to_assignment(g, costs.shape[1]))(g2p)
        return AssignResult(pred2gt=p2g, gt2pred=g2p)
    return jax.vmap(
        lambda c, v: solve_assignment(c, v, c.shape[0], topk=topk)
    )(costs, valids)


def assign_masks(cfg: AssignerConfig,
                 mask_logits: jax.Array,
                 cls_logits: Optional[jax.Array],
                 gt: GTSample,
                 use_valid_pixels: bool = True,
                 depth_logits: Optional[jax.Array] = None,
                 depth_act_mode: str = "sigmoid") -> AssignResult:
    """Per-image Hungarian assignment of thing GTs to prediction rows.

    mask_logits: (P, h, w) detached mask logits (stride-4 scaled, like the
    reference's ``scaled_mask_preds``); cls_logits: (P, num_things) or None.
    """
    cost = assignment_cost(cfg, mask_logits, cls_logits, gt,
                           use_valid_pixels, depth_logits, depth_act_mode)
    return solve_assignment(cost, gt.thing_valid, mask_logits.shape[0],
                            topk=cfg.topk)
