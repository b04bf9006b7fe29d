"""Vectorized training-target construction (no Python loops, static shapes).

reference target semantics:
* rcnn stage targets: /root/reference/polyphonic/kernel_update_head.py:443-534
  (labels with per-class weights, stuff identity label-weight block, rank
  target built by ascending overwrite, depth targets where the LAST stuff
  slot also regresses full-image depth);
* rpn targets: /root/reference/polyphonic/kernel_head.py:571-640 (adds the
  dense semantic seg target built by ascending overwrite).

The reference's sequential Python overwrite loops become max/argmax
reductions:  "last writer wins with ascending index" == "argmax over index".

Memory note: only ``mask_targets`` is materialized at (Q, h, w); mask pixel
weights factor into (row weight) x (valid_mask) and depth weights reuse
``mask_targets`` (the reference's depth weights ARE the soft GT masks).
"""
from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

from ..data.structures import GTSample
from .assign import AssignResult


class StageTargets(NamedTuple):
    labels: jax.Array  # (Q,) int32, num_classes = background
    label_weights: jax.Array  # (Q, C) float
    mask_targets: jax.Array  # (Q, h, w) float soft masks
    pos_row: jax.Array  # (Q,) bool — rows with a foreground label
    rank_target: jax.Array  # (h, w) int32, 255 = ignore
    depth_weights: jax.Array  # (Q, h, w) float (already x (depth>0))
    depth_has_target: jax.Array  # (Q,) float — rows whose target is gt_depth


def _gt2pred_rounds(assign: AssignResult) -> jax.Array:
    """Normalize gt2pred to (R, M): R matching rounds (R > 1 iff the
    assigner ran with topk > 1 — see train/assign.py::solve_assignment)."""
    g2p = assign.gt2pred
    return g2p if g2p.ndim == 2 else g2p[None]


def _scatter_thing_rows(values: jax.Array, assign: AssignResult,
                        gt: GTSample, num_rows: int) -> jax.Array:
    """Scatter per-GT values (M, ...) into prediction rows (num_rows, ...).

    With topk > 1 each GT's values land in every round's matched row
    (rounds are disjoint in pred rows)."""
    # one-hot contraction instead of a row scatter: matched pred rows are
    # disjoint across GTs and rounds, so the sum IS the scatter — and the
    # einsum runs as one MXU contraction instead of a serialized
    # per-index scatter.
    flat = values.reshape(values.shape[0], -1).astype(jnp.float32)
    onehot = None
    for g2p in _gt2pred_rounds(assign):
        ok = gt.thing_valid & (g2p >= 0)
        oh = (g2p[:, None] == jnp.arange(num_rows)[None]) & ok[:, None]
        onehot = oh if onehot is None else (onehot | oh)
    out = jnp.einsum("mq,mv->qv", onehot.astype(jnp.float32), flat)
    return out.reshape((num_rows,) + values.shape[1:]).astype(values.dtype)


def build_stage_targets(assign: AssignResult, gt: GTSample,
                        num_proposals: int, num_things: int,
                        num_classes: int, ignore_label: int = 255,
                        with_direct_row: bool = True,
                        stuff_in_rank: bool = True,
                        stuff_depth_bool: bool = False) -> StageTargets:
    """Targets for one kernel-update stage (Q = num_proposals + num_stuff).

    with_direct_row: rcnn stages additionally make the LAST row regress the
    full-image depth (kernel_update_head.py:524-527); rpn does not.
    stuff_in_rank: rcnn rank targets cover stuff rows (indices >= 100); the
    rpn rank loss only has 100 mask channels so its targets use things only.
    stuff_depth_bool: the rpn head BINARIZES the stuff-row depth weights —
    kernel_head.py:594 rebinds ``gt_sem_seg = gt_sem_seg.bool()`` (for the
    seg target) before line 633 reuses it as the depth weight, while the
    stage head (kernel_update_head.py:522) keeps the soft bilinear mask.
    Reproduced for parity (tests/test_train_loss_oracle.py).
    """
    num_stuff = num_classes - num_things
    q = num_proposals + num_stuff
    m = gt.thing_masks.shape[0]
    rounds = _gt2pred_rounds(assign)  # (R, M)

    # labels ---------------------------------------------------------------
    labels = jnp.concatenate([jnp.full((q,), num_classes, jnp.int32),
                              jnp.zeros((1,), jnp.int32)])
    for g2p in rounds:
        matched_r = gt.thing_valid & (g2p >= 0)
        idx = jnp.where(matched_r, g2p, q)
        labels = labels.at[idx].set(
            jnp.where(matched_r, gt.thing_labels, num_classes))
    labels = labels[:q]
    stuff_labels = jnp.where(gt.stuff_valid,
                             jnp.arange(num_stuff) + num_things, num_classes)
    labels = labels.at[num_proposals:].set(stuff_labels)

    # label weights ---------------------------------------------------------
    lw = jnp.ones((q, num_classes), jnp.float32)
    # thing rows never supervise stuff logits (kernel_update_head.py:493)
    lw = lw.at[:num_proposals, num_things:].set(0.0)
    stuff_block = jnp.concatenate(
        [jnp.zeros((num_stuff, num_things)), jnp.eye(num_stuff)], axis=1)
    lw = lw.at[num_proposals:].set(stuff_block)

    # mask targets ----------------------------------------------------------
    thing_part = _scatter_thing_rows(gt.thing_masks, assign, gt, num_proposals)
    stuff_part = gt.stuff_masks * gt.stuff_valid[:, None, None]
    mask_targets = jnp.concatenate([thing_part, stuff_part], axis=0)

    pos_row = (labels >= 0) & (labels < num_classes)

    # rank target: last (highest-index) pos row covering each pixel ----------
    matched = gt.thing_valid[None] & (rounds >= 0)  # (R, M)
    cand_thing = jnp.where((gt.thing_masks[None] > 0) & matched[:, :, None, None],
                           rounds[:, :, None, None], -1)
    rank = (cand_thing.max(axis=(0, 1)) if m > 0
            else jnp.full(gt.depth.shape, -1))
    if stuff_in_rank:
        cand_stuff = jnp.where(
            (gt.stuff_masks > 0) & gt.stuff_valid[:, None, None],
            (jnp.arange(num_stuff) + num_proposals)[:, None, None], -1)
        rank = jnp.maximum(rank, cand_stuff.max(axis=0))
    rank_target = jnp.where(rank >= 0, rank, ignore_label).astype(jnp.int32)

    # depth -----------------------------------------------------------------
    depth_valid = (gt.depth > 0).astype(jnp.float32)
    if stuff_depth_bool:
        depth_weights = jnp.concatenate(
            [thing_part, (stuff_part > 0).astype(jnp.float32)], axis=0)
    else:
        depth_weights = mask_targets
    depth_has_target = pos_row.astype(jnp.float32)
    if with_direct_row:
        depth_weights = depth_weights.at[-1].set(1.0)
        depth_has_target = depth_has_target.at[-1].set(1.0)
    depth_weights = depth_weights * depth_valid[None]

    return StageTargets(
        labels=labels,
        label_weights=lw,
        mask_targets=mask_targets,
        pos_row=pos_row,
        rank_target=rank_target,
        depth_weights=depth_weights,
        depth_has_target=depth_has_target,
    )


def build_seg_target(assign: AssignResult, gt: GTSample, num_things: int,
                     num_classes: int) -> jax.Array:
    """Dense semantic target for the rpn seg loss (kernel_head.py:589-604):
    stuff classes written in ascending class order, then pos things written
    in ascending matched-row order — i.e. argmax-by-index semantics."""
    num_stuff = num_classes - num_things
    m = gt.thing_masks.shape[0]
    rounds = _gt2pred_rounds(assign)  # (R, M)
    matched = gt.thing_valid[None] & (rounds >= 0)
    score_thing = jnp.where(
        (gt.thing_masks[None] > 0) & matched[:, :, None, None],
        rounds[:, :, None, None], -1).reshape((-1,) + gt.depth.shape)
    best = jnp.argmax(score_thing, axis=0) % m
    has_thing = score_thing.max(axis=0) >= 0
    thing_label = gt.thing_labels[best]
    cand_stuff = jnp.where(
        (gt.stuff_masks > 0) & gt.stuff_valid[:, None, None],
        jnp.arange(num_stuff)[:, None, None], -1)
    smax = cand_stuff.max(axis=0)
    seg = jnp.where(smax >= 0, smax + num_things, num_classes)
    seg = jnp.where(has_thing, thing_label, seg)
    return seg.astype(jnp.int32)
