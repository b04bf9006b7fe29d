"""Video (2-frame) training: key-frame losses + quasi-dense track loss.

reference: /root/reference/polyphonic/polyphonic_former_video.py:70-325.
The reference runs the ref-frame branch under no_grad/eval and a Hungarian
"track assignment" whose only effect is to ORDER the positive rows — the
pooled features are GT masks (QuasiDenseMaskEmbedHeadGTMask) and both the
multi-positive CE and the L2 aux loss are invariant to row/column
permutations, so the assignment is mathematically a no-op for the loss.  We
therefore index track rows directly by GT slot: row i of the key frame is
key GT instance i (valid slots only), matching the reference's loss value
without 2 extra Hungarian solves per step.
"""
from __future__ import annotations

from typing import Dict, Tuple

import jax
import jax.numpy as jnp

from ..configs import ModelConfig
from ..data.structures import GTSample, TrainBatch
from ..losses.track import l2_aux_loss, multi_pos_cross_entropy
from ..models.polyphonic import PolyphonicFormer
from ..ops.resize import resize_bilinear
from .losses import compute_losses


def track_pair_losses(cfg: ModelConfig, key_embeds: jax.Array,
                      ref_embeds: jax.Array, key_gt: GTSample,
                      ref_gt: GTSample) -> Dict[str, jax.Array]:
    """key_embeds/ref_embeds: (B, M, E) GT-mask embeddings (padded rows
    zeroed).  Matching targets come from shared instance ids
    (polyphonic_former_video.py:246-251, track_heads.py:104-121)."""
    th = cfg.track_head

    def _safe_normalize(e):
        # padded rows are exactly zero; jnp.linalg.norm has a NaN gradient
        # at 0, rsqrt(sumsq + eps) does not
        return e * jax.lax.rsqrt(jnp.sum(e * e, axis=1, keepdims=True) + 1e-12)

    def per_image(ke, re, kids, kval, rids, rval):
        dists = ke @ re.T  # (M, M) dot-product similarities
        cos = _safe_normalize(ke) @ _safe_normalize(re).T
        target = ((kids[:, None] == rids[None, :]) & (kids[:, None] >= 0)
                  ).astype(jnp.int32)
        pair_valid = kval[:, None] & rval[None, :]
        loss_track = multi_pos_cross_entropy(dists, target, pair_valid, kval)
        loss_aux = l2_aux_loss(cos, target, pair_valid,
                               neg_pos_ub=th.aux_neg_pos_ub,
                               pos_margin=th.aux_pos_margin,
                               neg_margin=th.aux_neg_margin,
                               hard_mining=th.aux_hard_mining)
        return loss_track, loss_aux

    lt, la = jax.vmap(per_image)(key_embeds, ref_embeds,
                                 key_gt.thing_inst_ids, key_gt.thing_valid,
                                 ref_gt.thing_inst_ids, ref_gt.thing_valid)
    return {
        "loss_track": th.loss_track_weight * lt.mean(),
        "loss_track_aux": th.loss_aux_weight * la.mean(),
    }


def gt_track_masks(gt: GTSample, pad_hw: Tuple[int, int]) -> jax.Array:
    """Upsample stride-4 GT thing masks to input resolution and binarize
    (polyphonic_former_video.py:283-291: bilinear upsample then >0 via the
    sigmoid(x) > 0.5 trick on mask values in [0,1])."""
    up = resize_bilinear(gt.thing_masks, pad_hw)
    return (up > 0).astype(jnp.float32)


def gt_track_boxes(gt: GTSample, pad_hw: Tuple[int, int]) -> jax.Array:
    """MAD RoI boxes of the binarized upsampled GT masks, bit-identical to
    ``masks_to_boxes_mad(gt_track_masks(gt, pad_hw))`` but computed from
    exact support marginals at stride 4 — never materializing the
    (B, M, H, W) full-res mask volume (tests/test_track_boxes.py)."""
    from ..ops.roi_align import (boxes_mad_from_marginals,
                                 upsampled_support_marginals)

    def per_image(m):
        rowcount, colcount = upsampled_support_marginals(m, pad_hw)
        return boxes_mad_from_marginals(rowcount, colcount)

    return jax.vmap(per_image)(gt.thing_masks)


def video_forward_losses(model: PolyphonicFormer, variables, cfg: ModelConfig,
                         batch: TrainBatch
                         ) -> Tuple[jax.Array, Dict[str, jax.Array]]:
    """Full 2-frame training forward + loss (to be wrapped in value_and_grad).

    The ref branch replicates the reference's no_grad/eval semantics: BN is
    always frozen here, and gradients are cut with stop_gradient on the ref
    outputs.
    """
    pad_hw = batch.image.shape[1:3]

    def apply(method, *args):
        return model.apply(variables, *args, method=method)

    # key frame
    key_feats = apply(PolyphonicFormer.extract_feat, batch.image)
    key_out = apply(PolyphonicFormer.forward_heads, key_feats)
    total, losses = compute_losses(cfg, key_out, batch.gt)

    # ref frame features, gradient-free (polyphonic_former_video.py:186-191);
    # the track head itself still receives gradients from the ref side
    ref_feats = jax.tree_util.tree_map(
        jax.lax.stop_gradient,
        apply(PolyphonicFormer.extract_feat, batch.ref_image))

    from .losses import _skip_groups

    if "track" not in _skip_groups():
        import os

        # track embedding RoI boxes: "marginal" computes them bit-exactly
        # from stride-4 support marginals (gt_track_boxes) without ever
        # materializing the (B, M, H, W) full-res GT mask volume that the
        # reference semantics describe; "masks" materializes the upsampled
        # masks and reduces them (the literal form).  Both are parity-tested
        # (tests/test_track_boxes.py); the default is re-measured per round
        # (tools_dev/bench_loss_groups.py).
        if os.environ.get("POLY_TRACK_BOXES", "marginal") == "marginal":
            b = batch.gt.thing_masks.shape[0]
            dummy = jnp.zeros((2 * b, batch.gt.thing_masks.shape[1], 1, 1),
                              jnp.float32)
            # key + ref frames batched through ONE track-head call (the
            # embed head is per-sample — convs/GN/fcs — so stacking is
            # exact; it halves the serial op chain vs two applications).
            # Both GT box sets come from one stacked marginal computation.
            both_gt = jax.tree_util.tree_map(
                lambda a, r: jnp.concatenate([a, r], axis=0),
                batch.gt, batch.ref_gt)
            pair_feats = jax.tree_util.tree_map(
                lambda k, r: jnp.concatenate([k, r], axis=0),
                key_feats, ref_feats)
            boxes = gt_track_boxes(both_gt, pad_hw)
            embeds = apply(PolyphonicFormer.forward_track_embeds,
                           pair_feats, dummy, both_gt.thing_valid, boxes)
            key_embeds, ref_embeds = embeds[:b], embeds[b:]
        else:
            key_masks = gt_track_masks(batch.gt, pad_hw)
            ref_masks = gt_track_masks(batch.ref_gt, pad_hw)
            key_embeds = apply(PolyphonicFormer.forward_track_embeds,
                               key_feats, key_masks, batch.gt.thing_valid)
            ref_embeds = apply(PolyphonicFormer.forward_track_embeds,
                               ref_feats, ref_masks, batch.ref_gt.thing_valid)

        track_losses = track_pair_losses(cfg, key_embeds, ref_embeds,
                                         batch.gt, batch.ref_gt)
        losses.update(track_losses)
        total = total + sum(track_losses.values())
    return total, losses
