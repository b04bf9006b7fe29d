"""Per-parameter GRADIENT parity against the reference's actual
``forward_train`` backward pass (round-4 VERDICT item 1, the suggested
extension of the loss-dict oracle).

The reference detector (/root/reference/polyphonic/polyphonic_former.py:30-128,
polyphonic_former_video.py:70-325) runs forward_train WITHOUT no_grad, its
optimized total — mmdet's ``_parse_losses`` rule: sum of entries whose key
contains 'loss' (/root/reference/mmdet/models/detectors/base.py:198-200) —
is backpropagated, and every parameter gradient is pushed through the SAME
linear weight-layout mapping as the weights (tools/convert_torch_ckpt, pure
transposes/reshapes, so grads map exactly like values).  Our
``jax.grad`` of ``compute_losses`` / ``video_forward_losses`` on
converted-identical weights and identical GT must match leaf for leaf.

This is strictly stronger than loss-value parity: it verifies every
stop-gradient placement (detached re-assignment preds, the video model's
no-grad reference branch), the avg_factor plumbing INSIDE the backward, and
that our optimized total is composed of exactly the terms the reference
backpropagates (e.g. ``depth_dense`` is logged but NOT optimized there).

Frozen params (requires_grad=False: backbone stem + layer1,
frozen_stages=1) have no torch grad; they are NaN-filled and skipped —
our side handles freezing in the optimizer mask (train/optim.py), not by
zeroing grads.
"""
from __future__ import annotations

import os
import sys

import numpy as np
import pytest

REF = "/root/reference"
pytestmark = pytest.mark.skipif(not os.path.isdir(REF),
                                reason="reference tree unavailable")

sys.path.insert(0, os.path.dirname(__file__))

from test_train_loss_oracle import (H, W, _install, _our_gt, _ref_gt_args,
                                    _train_cfg_dict, make_frame)


def _grad_state_dict(model):
    """named_parameters grads (NaN for requires_grad=False) + zero buffers,
    shaped exactly like the state_dict the converter maps."""
    sd = {}
    for name, p in model.named_parameters():
        g = p.grad
        sd[name] = (np.full(tuple(p.shape), np.nan, np.float32)
                    if g is None else
                    np.asarray(g.detach().numpy(), np.float32))
    for name, b in model.named_buffers():
        sd[name] = np.zeros(tuple(b.shape), np.float32)
    return sd


def _compare_grad_trees(want_params, got_params):
    """Per-leaf relative-L2 gate; all-NaN want leaves = frozen, skipped."""
    import jax

    want = dict(jax.tree_util.tree_leaves_with_path(want_params))
    got = dict(jax.tree_util.tree_leaves_with_path(got_params))
    assert set(want) == set(got)
    checked = skipped = 0
    errs = []
    for path in sorted(want, key=str):
        w = np.asarray(want[path], np.float64)
        g = np.asarray(got[path], np.float64)
        if np.isnan(w).all():  # frozen in torch (stem + layer1)
            skipped += 1
            continue
        assert np.isfinite(w).all() and np.isfinite(g).all(), path
        nw = np.linalg.norm(w)
        if nw < 1e-7:
            assert np.linalg.norm(g) < 1e-5, (
                f"{jax.tree_util.keystr(path)}: ref grad ~0, "
                f"ours {np.linalg.norm(g):.2e}")
        else:
            rel = np.linalg.norm(g - w) / nw
            errs.append((rel, jax.tree_util.keystr(path)))
        checked += 1
    worst = sorted(errs, reverse=True)[:8]
    assert checked > 100 and skipped > 0, (checked, skipped)
    assert worst[0][0] < 5e-3, (
        f"checked {checked} leaves, worst relative-L2 errors:\n"
        + "\n".join(f"  {r:.2e}  {p}" for r, p in worst))


def test_image_train_grad_parity():
    import torch

    poly = _install()
    from test_reference_parity import _as_cfg, _reference_model_cfg

    import jax
    import jax.numpy as jnp

    from polyphonicformer_tpu.configs import ModelConfig
    from polyphonicformer_tpu.models import PolyphonicFormer
    from polyphonicformer_tpu.tools.convert_torch_ckpt import \
        convert_state_dict
    from polyphonicformer_tpu.train.losses import compute_losses

    torch.manual_seed(0)
    rcfg = _as_cfg(_reference_model_cfg())
    model = poly.Polyphonic(
        backbone=rcfg["backbone"], neck=rcfg["neck"],
        rpn_head=rcfg["rpn_head"], roi_head=rcfg["roi_head"],
        train_cfg=_as_cfg(_train_cfg_dict()), test_cfg=rcfg["test_cfg"],
        num_thing_classes=rcfg["num_thing_classes"],
        num_stuff_classes=rcfg["num_stuff_classes"])
    model.train()

    rng = np.random.RandomState(5)
    frame = make_frame(rng, n_things=5, inst_ids=[11, 12, 13, 14, 15],
                       stuff_classes=[8, 9, 11, 13, 16, 18])
    img, metas, bm, labels, _, depth = _ref_gt_args(frame)
    ref_losses = model.forward_train(
        img, metas, gt_labels=[labels], gt_masks=[bm], gt_depth=depth)
    # the reference's ACTUAL optimized total (_parse_losses 'loss'-in-key)
    ref_total = sum(v for k, v in ref_losses.items() if "loss" in k)
    ref_total.backward()
    sd = {k: v.detach().numpy() for k, v in model.state_dict().items()}
    grad_sd = _grad_state_dict(model)

    cfg = ModelConfig()
    want_grads = convert_state_dict(grad_sd, cfg)["params"]
    variables = jax.tree_util.tree_map(jnp.asarray,
                                       convert_state_dict(sd, cfg))
    consts = {k: v for k, v in variables.items() if k != "params"}
    our_model = PolyphonicFormer(cfg)
    gt, _ = _our_gt(frame, cfg)
    jimg = jnp.asarray(frame["img"])[None]

    def loss_fn(params):
        v = {"params": params, **consts}
        feats = our_model.apply(v, jimg,
                                method=PolyphonicFormer.extract_feat)
        out = our_model.apply(v, feats,
                              method=PolyphonicFormer.forward_heads)
        total, _losses = compute_losses(cfg, out, gt)
        return total

    our_total, our_grads = jax.jit(jax.value_and_grad(loss_fn))(
        variables["params"])
    np.testing.assert_allclose(float(our_total), float(ref_total), rtol=2e-3)
    _compare_grad_trees(want_grads, our_grads)


def test_video_train_grad_parity():
    """Video model: additionally pins the NO-GRAD reference branch
    (polyphonic_former_video.py:137-175 runs the ref frame under no_grad;
    our video_forward_losses must stop_gradient the same subtree) and the
    track-loss backward through RoIAlign + embed heads."""
    import torch

    poly = _install()
    from test_reference_parity import _as_cfg, _reference_model_cfg

    import jax
    import jax.numpy as jnp

    from polyphonicformer_tpu.configs import get_preset
    from polyphonicformer_tpu.data.structures import TrainBatch
    from polyphonicformer_tpu.models import PolyphonicFormer
    from polyphonicformer_tpu.tools.convert_torch_ckpt import \
        convert_state_dict
    from polyphonicformer_tpu.train.video_losses import video_forward_losses

    torch.manual_seed(3)
    rcfg = _reference_model_cfg()
    rcfg["rpn_head"]["loss_depth"]["loss_weight"] = 1.0
    rcfg["roi_head"]["tracking"] = True
    track_head = dict(
        type="QuasiDenseMaskEmbedHeadGTMask", num_convs=4, num_fcs=1,
        embed_channels=256, norm_cfg=dict(type="GN", num_groups=32),
        loss_track=dict(type="MultiPosCrossEntropyLoss", loss_weight=0.25),
        loss_track_aux=dict(type="L2Loss", neg_pos_ub=3, pos_margin=0,
                            neg_margin=0.1, hard_mining=True,
                            loss_weight=1.0))
    bbox_roi_extractor = dict(
        type="SingleRoIExtractor",
        roi_layer=dict(type="RoIAlign", output_size=7, sampling_ratio=2),
        out_channels=256, featmap_strides=[4, 8, 16, 32])
    track_train_cfg = dict(
        assigner=dict(
            type="MaskHungarianAssigner",
            cls_cost=dict(type="FocalLossCost", weight=2.0),
            dice_cost=dict(type="DiceCost", weight=4.0, pred_act=True),
            mask_cost=dict(type="MaskCost", weight=1.0, pred_act=True)),
        sampler=dict(type="MaskPseudoSampler"))
    rcfg = _as_cfg(rcfg)
    model = poly.PolyphonicVideo(
        backbone=rcfg["backbone"], neck=rcfg["neck"],
        rpn_head=rcfg["rpn_head"], roi_head=rcfg["roi_head"],
        train_cfg=_as_cfg(_train_cfg_dict()), test_cfg=rcfg["test_cfg"],
        num_thing_classes=rcfg["num_thing_classes"],
        num_stuff_classes=rcfg["num_stuff_classes"],
        track_head=_as_cfg(track_head),
        bbox_roi_extractor=_as_cfg(bbox_roi_extractor),
        track_train_cfg=_as_cfg(track_train_cfg), tracker=None)
    model.train()

    rng = np.random.RandomState(9)
    key = make_frame(rng, n_things=4, inst_ids=[21, 22, 23, 24],
                     stuff_classes=[8, 10, 12, 15, 17])
    ref = make_frame(rng, n_things=4, inst_ids=[22, 21, 99, 24],
                     stuff_classes=[8, 10, 13, 15, 18])
    img_k, metas, bm_k, labels_k, ids_k, depth_k = _ref_gt_args(key)
    img_r, _, bm_r, labels_r, ids_r, depth_r = _ref_gt_args(ref)
    meta_r = dict(metas[0])
    labels_r2 = torch.stack([torch.zeros_like(labels_r), labels_r], dim=1)
    ids_r2 = torch.stack([torch.zeros_like(ids_r), ids_r], dim=1)
    ref_losses = model.forward_train(
        img_k, metas,
        gt_labels=[labels_k], gt_masks=[bm_k], gt_depth=depth_k,
        ref_img=img_r[:, None], ref_img_metas=[[meta_r]],
        ref_gt_bboxes=[[torch.zeros((len(labels_r), 4))]],
        ref_gt_labels=[labels_r2], ref_gt_masks=[[bm_r]],
        ref_gt_semantic_seg=torch.zeros((1, 1, 1, H, W)),
        ref_gt_depth=depth_r[:, None],
        gt_instance_ids=[ids_k], ref_gt_instance_ids=[ids_r2])
    ref_total = sum(v for k, v in ref_losses.items() if "loss" in k)
    ref_total.backward()
    sd = {k: v.detach().numpy() for k, v in model.state_dict().items()}
    grad_sd = _grad_state_dict(model)

    mc = get_preset("video_r50_1x").model
    want_grads = convert_state_dict(grad_sd, mc)["params"]
    variables = jax.tree_util.tree_map(jnp.asarray,
                                       convert_state_dict(sd, mc))
    consts = {k: v for k, v in variables.items() if k != "params"}
    our_model = PolyphonicFormer(mc)
    gt_k, _ = _our_gt(key, mc)
    gt_r, _ = _our_gt(ref, mc)
    batch = TrainBatch(
        image=jnp.asarray(key["img"])[None], gt=gt_k,
        ref_image=jnp.asarray(ref["img"])[None], ref_gt=gt_r)

    def loss_fn(params):
        total, _losses = video_forward_losses(
            our_model, {"params": params, **consts}, mc, batch)
        return total

    our_total, our_grads = jax.jit(jax.value_and_grad(loss_fn))(
        variables["params"])
    np.testing.assert_allclose(float(our_total), float(ref_total), rtol=2e-3)
    _compare_grad_trees(want_grads, our_grads)
