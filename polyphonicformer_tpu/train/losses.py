"""End-to-end training losses for PolyphonicFormer-TPU.

Mirrors the reference loss pipeline exactly:
* rpn (KernelHead) losses: /root/reference/polyphonic/kernel_head.py:349-569
  (mask BCE + per-row dice + rank CE + dense seg focal + masked depth +
  dense depth);
* per-stage (KernelUpdateHead) losses:
  /root/reference/polyphonic/kernel_update_head.py:355-441 (cls focal with
  per-class weights, mask BCE, dice, rank CE, masked depth with the
  direct-depth last row);
* stage re-assignment on the PREVIOUS stage's detached predictions
  (/root/reference/polyphonic/kernel_update.py:208-275).

Cross-device normalization note: the reference all-reduces positive counts so
focal ``avg_factor`` matches across ranks (mmdet reduce_mean).  Computing the
loss over the global batch inside one jitted SPMD program gives exactly the
same normalization (global sum / global count) without explicit collectives.
"""
from __future__ import annotations

from typing import Dict, Tuple

import jax
import jax.numpy as jnp

from ..configs import ModelConfig
from ..data.structures import GTSample
from ..losses.cross_entropy import binary_cross_entropy_with_logits, softmax_ce_ignore
from ..losses.depth_loss import depth_loss
from ..losses.dice import dice_loss_per_row
from ..losses.focal import sigmoid_focal_loss_elements
from ..models.polyphonic import ModelOutput
from ..ops.resize import resize_bilinear
from .assign import (AssignResult, assignment_cost,
                     solve_assignments_lockstep)
from .targets import StageTargets, build_seg_target, build_stage_targets


def is_metric_key(k: str) -> bool:
    """True for loss-dict entries that are LOGGED but not OPTIMIZED.

    Besides the ``*_acc`` metrics, the dense rpn depth term is metric-only:
    the reference emits it under the key ``depth_dense``
    (/root/reference/polyphonic/kernel_head.py:438), and mmdet's
    ``_parse_losses`` sums only keys containing the substring 'loss'
    (/root/reference/mmdet/models/detectors/base.py:198-200) — so the
    reference logs it without ever backpropagating it.
    """
    return k.endswith("_acc") or k == "loss_rpn_depth_dense"


def _upsample2(x: jax.Array) -> jax.Array:
    """Bilinear x2 on the trailing (h, w) axes (align_corners=False)."""
    return resize_bilinear(x, (x.shape[-2] * 2, x.shape[-1] * 2))


def _skip_groups() -> frozenset:
    """Dev-only attribution knob (tools_dev/bench_train.py): loss groups
    named in POLY_LOSS_SKIP (comma-separated: mask,dice,rank,seg,depth,cls,
    track) are omitted from the graph entirely so XLA dead-codes their
    cost.  Empty (the default) in production and tests."""
    import os

    v = os.environ.get("POLY_LOSS_SKIP", "")
    return frozenset(x for x in v.split(",") if x)


def _use_fused_mask_loss(skip: frozenset, shape, ignore_label: int = 255) -> bool:
    """Gate for the single-pass Pallas loss-reduction kernel
    (POLY_MASK_LOSS_IMPL=mega on TPU; =interpret for tests).  Default OFF:
    isolated, the fused pass beats the XLA reductions 81 vs 126 ms at
    production scale, but inside the full train step the numbers are
    indistinguishable (162.9 xla / 165.4 mega / 168.5 xla,
    tools_dev/bench_loss_impls.py) — XLA already overlaps these reductions
    with the rest of the backward schedule, so removing their HBM passes
    buys no wall-clock.  Kept as a tested opt-in; the negative result is
    recorded in ROUND4.md."""
    import os

    from ..ops.pallas.mask_loss import fits_vmem
    from ..ops.resize import _on_tpu

    impl = os.environ.get("POLY_MASK_LOSS_IMPL", "xla")
    if impl == "xla" or (skip & {"mask", "dice", "rank"}):
        return False
    if ignore_label != 255:  # kernel hardcodes _IGNORE=255 for the rank mask
        return False
    s, b, q, h, w = shape
    if not fits_vmem(q, h, w) or h % 8 != 0:
        return False
    return _on_tpu() or impl == "interpret"


def _fused_mask_dice_rank(cfg: ModelConfig, m32, tgt, pos, valid,
                          rank_target, num_rows: int, prefixes,
                          losses: Dict[str, jax.Array]) -> None:
    """Mask BCE + dice + rank via ops/pallas/mask_loss.py — one VMEM pass
    forward, one backward; values identical to the XLA path
    (tests/test_pallas_ops.py::TestFusedMaskLoss)."""
    import os

    from ..ops.pallas.mask_loss import fused_mask_loss_stats

    interpret = os.environ.get("POLY_MASK_LOSS_IMPL", "mega") == "interpret"
    s, b, q, h, w = m32.shape
    sg = jax.lax.stop_gradient
    stats, dice_abc = fused_mask_loss_stats(
        m32.reshape(s * b, q, h, w),
        sg(tgt.astype(jnp.float32)).reshape(s * b, q, h, w),
        sg(pos).reshape(s * b, q),
        sg(jnp.broadcast_to(valid[None].astype(jnp.float32),
                            (s, b, h, w))).reshape(s * b, h, w),
        sg(rank_target).reshape(s * b, h, w),
        interpret)
    stats = stats.reshape(s, b, -1)
    dice_abc = dice_abc.reshape(s, b, 3, q)

    denom = jnp.maximum(
        jnp.einsum("sbq,b->s", pos, valid.astype(jnp.float32).sum(axis=(1, 2))), 1.0)
    mask_vec = cfg.loss_mask_weight * stats[..., 0].sum(axis=1) / denom

    a, bb, cc = (dice_abc[:, :, 0], dice_abc[:, :, 1] + 1e-3,
                 dice_abc[:, :, 2] + 1e-3)
    dice = 1.0 - 2.0 * a / (bb + cc)  # (S, B, Q)
    num_pos = jnp.maximum(pos.sum(axis=(1, 2)), 1.0)
    dice_vec = cfg.loss_dice_weight * (dice * pos).sum(axis=(1, 2)) / num_pos

    rank_vec = cfg.loss_rank_weight * stats[..., 1].sum(axis=1) / (b * h * w)

    for i, p in enumerate(prefixes):
        losses[f"{p}_mask"] = mask_vec[i]
        losses[f"{p}_dice"] = dice_vec[i]
        losses[f"{p}_rank"] = rank_vec[i]


def _mask_dice_rank_losses_stacked(cfg: ModelConfig, mask_logits: jax.Array,
                                   targets: StageTargets, gt: GTSample,
                                   num_rows: int, prefixes,
                                   losses: Dict[str, jax.Array]) -> None:
    """Shared mask BCE + dice + rank losses over the first ``num_rows`` rows
    for S stacked stages at once.

    mask_logits: (S, B, Q', h, w) with Q' == num_rows; targets leaves carry a
    leading (S, B, ...) — the S refinement stages' losses are structurally
    identical, so computing them in ONE set of contractions (stage axis
    folded into the einsums) replaces 3 sequences of small ops with one; the
    per-stage normalizations are preserved exactly by reducing to (S,)
    vectors.  prefixes: length-S loss-name prefixes.
    """
    skip = _skip_groups()
    pos = targets.pos_row[..., :num_rows].astype(jnp.float32)  # (S, B, Q')
    tgt = targets.mask_targets[..., :num_rows, :, :]
    valid = gt.valid_mask  # (B, h, w)
    s = mask_logits.shape[0]

    m32 = mask_logits.astype(jnp.float32)

    if _use_fused_mask_loss(skip, m32.shape, cfg.ignore_label):
        _fused_mask_dice_rank(cfg, m32, tgt, pos, valid,
                              targets.rank_target, num_rows, prefixes,
                              losses)
        return

    if "mask" not in skip:
        bce = binary_cross_entropy_with_logits(m32, tgt)
        # (elem_w > 0) == pos_row & valid, which is separable
        denom = jnp.maximum(
            jnp.einsum("sbq,b->s", pos, valid.sum(axis=(1, 2))), 1.0)
        mask_vec = cfg.loss_mask_weight * jnp.einsum(
            "sbqhw,sbq,bhw->s", bce, pos, valid) / denom
        for i, p in enumerate(prefixes):
            losses[f"{p}_mask"] = mask_vec[i]

    if "dice" not in skip:
        # dice over valid pixels: valid is 0/1 so (p*m)^2 == p^2*m etc.
        p = jax.nn.sigmoid(m32)
        a = jnp.einsum("sbqhw,sbqhw,bhw->sbq", p, tgt, valid)
        bb = jnp.einsum("sbqhw,sbqhw,bhw->sbq", p, p, valid) + 1e-3
        cc = jnp.einsum("sbqhw,sbqhw,bhw->sbq", tgt, tgt, valid) + 1e-3
        dice = 1.0 - 2.0 * a / (bb + cc)
        num_pos = jnp.maximum(pos.sum(axis=(1, 2)), 1.0)  # (S,)
        dice_vec = cfg.loss_dice_weight * (
            (dice * pos).sum(axis=(1, 2)) / num_pos)
        for i, pfx in enumerate(prefixes):
            losses[f"{pfx}_dice"] = dice_vec[i]

    if "rank" not in skip:
        # softmax CE over the QUERY axis (axis 2) without transposing the
        # (S, B, Q, h, w) volume to channels-last.
        labels = targets.rank_target  # (S, B, h, w)
        c = num_rows
        rvalid = (labels != cfg.ignore_label) & (labels >= 0) & (labels < c)
        safe = jnp.where(rvalid, labels, 0)
        import os

        impl = os.environ.get("POLY_RANK_IMPL", "lse_pick")
        if impl == "gather":
            # original form: materialized log_softmax + axis-2 gather
            logp = jax.nn.log_softmax(m32, axis=2)
            nll = -jnp.take_along_axis(logp, safe[:, :, None], axis=2)[:, :, 0]
        else:
            # picked logit via a fused masked reduction instead of an axis
            # gather (TPU gathers along a non-minor axis are per-element).
            # onehot compare fuses into the reduction — never materialized.
            onehot = (jnp.arange(c, dtype=jnp.int32)[None, None, :, None, None]
                      == safe[:, :, None])
            picked = jnp.sum(jnp.where(onehot, m32, 0.0), axis=2)
            if impl == "softmax_pick":
                logp = jax.nn.log_softmax(m32, axis=2)
                nll = -jnp.sum(jnp.where(onehot, logp, 0.0), axis=2)
            else:  # lse_pick: no materialized log_softmax at all
                nll = jax.nn.logsumexp(m32, axis=2) - picked
        rank_vec = cfg.loss_rank_weight * jnp.where(
            rvalid, nll, 0.0).reshape(s, -1).mean(axis=1)
        for i, pfx in enumerate(prefixes):
            losses[f"{pfx}_rank"] = rank_vec[i]


def _mask_dice_rank_losses(cfg: ModelConfig, mask_logits: jax.Array,
                           targets: StageTargets, gt: GTSample,
                           num_rows: int, prefix: str,
                           losses: Dict[str, jax.Array]) -> None:
    """Single-problem wrapper over the stacked form (S=1)."""
    _mask_dice_rank_losses_stacked(
        cfg, mask_logits[None],
        jax.tree_util.tree_map(lambda a: a[None], targets),
        gt, num_rows, [prefix], losses)


def _depth_stage_loss(cfg: ModelConfig, depth_logits: jax.Array,
                      targets: StageTargets, gt: GTSample, weight_cfg) -> jax.Array:
    """Masked per-query depth loss. depth_logits: (B, Q, h, w)."""
    tgt = gt.depth[:, None] * targets.depth_has_target[:, :, None, None]
    return depth_loss(
        depth_logits, tgt, targets.depth_weights,
        loss_weight=weight_cfg.loss_weight, depth_act_mode=weight_cfg.depth_act_mode,
        si_weight=weight_cfg.si_weight, sq_rel_weight=weight_cfg.sq_rel_weight,
        abs_rel_weight=weight_cfg.abs_rel_weight)


def compute_losses(cfg: ModelConfig, out: ModelOutput, gt: GTSample
                   ) -> Tuple[jax.Array, Dict[str, jax.Array]]:
    """Full loss dict for one (image-model) forward. gt is batched."""
    losses: Dict[str, jax.Array] = {}
    b = out.rpn.mask_preds.shape[0]
    nt, nc = cfg.num_thing_classes, cfg.num_classes
    np_, nq = cfg.num_proposals, cfg.num_queries

    # ---- one stacked upsample for every mask volume ----------------------
    # rpn.mask_preds[:, :num_proposals] IS mask_preds_things (kernel_head
    # concat), so one (1+S, B, nq, h, w) upsample feeds the rpn loss, every
    # stage loss and every assignment cost.
    all_masks = jnp.stack([out.rpn.mask_preds]
                          + [so.mask_preds for so in out.stages])
    scaled_all_masks = _upsample2(all_masks)  # (1+S, B, nq, 2h, 2w)
    scaled_rpn_masks = scaled_all_masks[0, :, :np_]  # (B, 100, h, w)
    scaled_seg = _upsample2(jnp.moveaxis(out.rpn.seg_preds, -1, 1))  # (B, 19, h, w)
    scaled_depth0 = _upsample2(out.rpn.depth_pred[:, None])[:, 0]  # (B, h, w)

    # ---- ALL Hungarian solves in one lockstep batch ---------------------
    # Every assignment input is a detached forward output (the previous
    # stage's predictions), so the 1+num_stages per-image solves are
    # independent.  The solver's serial while_loop iteration count is its
    # entire cost on TPU, and lockstep-vmapped problems share it — so
    # 4 solves cost one (measured: the assignment dominated the train step).
    # Reference equivalent: the 4 sequential scipy calls per image
    # (/root/reference/polyphonic/funcs/assigner.py:511-533).
    # refinement-stage predictions stacked on a leading stage axis: the S
    # stages' upsamples / targets / losses are structurally identical, so
    # one set of (S, ...)-shaped ops replaces S sequences of small ops (the
    # loss side is op-count bound, not bandwidth bound — ROUND3.md).
    n_stages = len(out.stages)
    stage_cls = jnp.stack([so.cls_score for so in out.stages])  # (S,B,Q,C)
    stage_deps = jnp.stack([so.depth_preds for so in out.stages])
    scaled_stage_masks = scaled_all_masks[1:]
    scaled_stage_deps = _upsample2(stage_deps)

    det_all = jax.lax.stop_gradient(scaled_all_masks)
    det_cls = jax.lax.stop_gradient(stage_cls)

    same_assigner = cfg.rpn_assigner == cfg.rcnn_assigner
    if same_assigner and cfg.rcnn_assigner.depth_weight == 0:
        # The rpn assignment and the stage-0 re-assignment are the SAME
        # problem: both cost matrices come from the detached rpn thing-mask
        # logits with no cls term (rpn rows [:P] == mask_preds_things), and
        # the configs match — the reference's two scipy calls on these
        # produce the same matching (kernel_head.py:349-454 vs
        # kernel_update.py:208-275).  Solve each distinct problem once,
        # lockstep, with all mask+dice costs from one stacked contraction.
        from .assign import focal_cls_cost, mask_dice_costs_stacked

        acfg = cfg.rcnn_assigner
        costs = mask_dice_costs_stacked(
            acfg, det_all[:n_stages, :, :np_], gt)  # (S, B, P, M)
        if acfg.cls_weight != 0 and n_stages > 1:
            cls_c = jax.vmap(jax.vmap(
                lambda c, l: focal_cls_cost(c, l, acfg.focal_gamma,
                                            acfg.focal_alpha)
            ), in_axes=(0, None))(det_cls[:n_stages - 1, :, :np_, :nt],
                                  gt.thing_labels)
            costs = costs.at[1:].add(acfg.cls_weight * cls_c)
        flat_costs = costs.reshape((n_stages * b,) + costs.shape[2:])
        flat_valid = jnp.tile(gt.thing_valid, (n_stages, 1))
        flat_assign = solve_assignments_lockstep(flat_costs, flat_valid,
                                                 topk=acfg.topk)
        per_problem = jax.tree_util.tree_map(
            lambda a: a.reshape((n_stages, b) + a.shape[1:]), flat_assign)
        uniq = [AssignResult(pred2gt=per_problem.pred2gt[i],
                             gt2pred=per_problem.gt2pred[i])
                for i in range(n_stages)]
        assigns = [uniq[0]] + uniq  # rpn shares problem 0 with stage 0
    else:
        # general path: every problem its own cost, grouped by topk
        cost_list = []  # each (B, P, M)
        cost_list.append(jax.vmap(
            lambda m, g: assignment_cost(cfg.rpn_assigner, m, None, g)
        )(det_all[0, :, :np_], gt))
        for stage in range(n_stages):
            pm = det_all[stage][:, :np_]
            if stage == 0:
                cost_list.append(jax.vmap(
                    lambda m, g: assignment_cost(cfg.rcnn_assigner, m, None, g)
                )(pm, gt))
            else:
                pc = det_cls[stage - 1][:, :np_, :nt]
                cost_list.append(jax.vmap(
                    lambda m, c, g: assignment_cost(cfg.rcnn_assigner, m, c, g)
                )(pm, pc, gt))

        tk_rpn, tk_rcnn = cfg.rpn_assigner.topk, cfg.rcnn_assigner.topk
        if tk_rpn == tk_rcnn:
            groups = [(cost_list, tk_rpn)]
        else:  # mixed topk: two lockstep groups (rpn | rcnn stages)
            groups = [(cost_list[:1], tk_rpn), (cost_list[1:], tk_rcnn)]
        assigns = []
        for group, topk in groups:
            costs = jnp.stack(group, axis=0)  # (ng, B, P, M)
            ng = costs.shape[0]
            flat_costs = costs.reshape((ng * b,) + costs.shape[2:])
            flat_valid = jnp.tile(gt.thing_valid, (ng, 1))
            flat_assign = solve_assignments_lockstep(flat_costs, flat_valid,
                                                     topk=topk)
            per_problem = jax.tree_util.tree_map(
                lambda a: a.reshape((ng, b) + a.shape[1:]), flat_assign)
            assigns += [AssignResult(pred2gt=per_problem.pred2gt[i],
                                     gt2pred=per_problem.gt2pred[i])
                        for i in range(ng)]

    rpn_assign = assigns[0]

    rpn_targets = jax.vmap(
        lambda a, g: build_stage_targets(a, g, np_, nt, nc, cfg.ignore_label,
                                         with_direct_row=False,
                                         stuff_in_rank=False,
                                         stuff_depth_bool=True)
    )(rpn_assign, gt)

    _mask_dice_rank_losses(cfg, scaled_rpn_masks, rpn_targets, gt, np_,
                           "loss_rpn", losses)

    skip = _skip_groups()
    if "seg" not in skip:
        # dense semantic focal loss (kernel_head.py:541-553)
        seg_target = jax.vmap(lambda a, g: build_seg_target(a, g, nt, nc))(rpn_assign, gt)
        seg_logits = jnp.moveaxis(scaled_seg, 1, -1)  # (B, h, w, 19)
        onehot = jax.nn.one_hot(seg_target, nc + 1, dtype=jnp.float32)[..., :nc]
        seg_valid = (seg_target != nc).astype(jnp.float32)
        focal = sigmoid_focal_loss_elements(seg_logits.astype(jnp.float32), onehot,
                                            cfg.focal_gamma, cfg.focal_alpha)
        num_dense_pos = jnp.maximum(seg_valid.sum(), 1.0)
        losses["loss_rpn_seg"] = cfg.loss_seg_weight * (
            focal * seg_valid[..., None]).sum() / num_dense_pos

        # auxiliary ASPP semantic CE (semantic_out_cfg head): softmax CE with
        # ignore_index=num_classes over the same dense seg target, x2
        # upsampled like seg_preds (kernel_head.py:385-392,561-566)
        if out.rpn.aspp_seg_preds is not None:
            scaled_aspp = jnp.moveaxis(
                _upsample2(jnp.moveaxis(out.rpn.aspp_seg_preds, -1, 1)), 1, -1)
            losses["loss_aspp_semseg"] = cfg.loss_aspp_weight * softmax_ce_ignore(
                scaled_aspp, seg_target, ignore_index=nc)

    if "depth" not in skip:
        # masked depth over 111 rows of (identical) dense depth (kernel_head.py:478-486)
        rpn_depth_logits = jnp.broadcast_to(
            scaled_depth0[:, None], (b, nq) + scaled_depth0.shape[1:])
        losses["loss_rpn_depth"] = _depth_stage_loss(
            cfg, rpn_depth_logits, rpn_targets, gt, cfg.rpn_depth_loss)
        # dense depth (kernel_head.py:438-442)
        losses["loss_rpn_depth_dense"] = depth_loss(
            scaled_depth0, gt.depth, (gt.depth > 0).astype(jnp.float32),
            loss_weight=cfg.rpn_depth_loss.loss_weight,
            depth_act_mode=cfg.rpn_depth_loss.depth_act_mode)

    # ---- refinement stages (stacked) --------------------------------------
    # stage s is (re-)assigned on stage s-1's detached predictions
    # (kernel_update.py:208-275) — solved above in the batched lockstep pass.
    # All S stages' targets and losses compute in one stacked pass; each
    # per-stage normalization reduces to a (S,) vector, so the values match
    # the sequential form exactly.
    n_stages = len(out.stages)
    stage_assigns = AssignResult(
        pred2gt=jnp.stack([assigns[s + 1].pred2gt for s in range(n_stages)]),
        gt2pred=jnp.stack([assigns[s + 1].gt2pred for s in range(n_stages)]))

    build_one = jax.vmap(
        lambda a, g: build_stage_targets(a, g, np_, nt, nc, cfg.ignore_label,
                                         with_direct_row=True))
    targets = jax.vmap(lambda a: build_one(a, gt))(stage_assigns)

    prefixes = [f"s{i}_loss" for i in range(n_stages)]
    pos = targets.pos_row.astype(jnp.float32)  # (S, B, Q)
    num_pos_vec = jnp.maximum(pos.sum(axis=(1, 2)) / b, 1.0)  # (S,)
    if "cls" not in skip:
        onehot = jax.nn.one_hot(targets.labels, nc + 1,
                                dtype=jnp.float32)[..., :nc]
        focal = sigmoid_focal_loss_elements(
            stage_cls.astype(jnp.float32), onehot, cfg.focal_gamma,
            cfg.focal_alpha)
        cls_vec = cfg.loss_cls_weight * (
            (focal * targets.label_weights).sum(axis=(1, 2, 3))
            / (num_pos_vec * b))
        for i, p in enumerate(prefixes):
            losses[f"{p}_cls"] = cls_vec[i]
    # pos_acc metric: top-1 accuracy on positive queries (reference
    # kernel_update_head.py:400-401; metric only — excluded from total
    # by the "_acc" suffix convention below)
    pred_cls = jnp.argmax(stage_cls, axis=-1)  # (S, B, Q)
    correct = (pred_cls == targets.labels).astype(jnp.float32) * pos
    acc_vec = 100.0 * correct.sum(axis=(1, 2)) / jnp.maximum(
        pos.sum(axis=(1, 2)), 1.0)
    for i in range(n_stages):
        losses[f"s{i}_pos_acc"] = acc_vec[i]

    _mask_dice_rank_losses_stacked(cfg, scaled_stage_masks, targets, gt, nq,
                                   prefixes, losses)
    if "depth" not in skip:
        from ..losses.depth_loss import depth_loss_stacked

        wcfg = cfg.rcnn_depth_loss
        dep_tgt = (gt.depth[None, :, None]
                   * targets.depth_has_target[:, :, :, None, None])
        dep_vec = depth_loss_stacked(
            scaled_stage_deps, dep_tgt, targets.depth_weights,
            loss_weight=wcfg.loss_weight, depth_act_mode=wcfg.depth_act_mode,
            si_weight=wcfg.si_weight, sq_rel_weight=wcfg.sq_rel_weight,
            abs_rel_weight=wcfg.abs_rel_weight)
        for i, p in enumerate(prefixes):
            losses[f"{p}_depth"] = dep_vec[i]

    total = jnp.sum(jnp.stack([v for k, v in losses.items()
                               if not is_metric_key(k)]))
    return total, losses
