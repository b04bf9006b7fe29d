"""End-to-end TRAIN-STEP loss-dict parity against the reference's ACTUAL
``forward_train`` (round-4 VERDICT item 1 — the last reference code path
with no executable oracle).

The real reference detectors (/root/reference/polyphonic/polyphonic_former.py:30-128
and polyphonic_former_video.py:70-325) are instantiated WITH the shipped
train_cfg (configs/_base_/models/polyphonic_former.py:166-196 + the video
config's track_train_cfg), loaded through the refshim at torch random init,
and run on an identical real-layout GT batch.  Their state_dict is pushed
through tools/convert_torch_ckpt and the SAME image + GT run through
train/losses.py::compute_losses / train/video_losses.py::video_forward_losses.
Every entry of the loss dict — rpn mask/dice/rank/seg, masked + dense depth,
per-stage cls/mask/dice/rank/depth (with the 3-stage re-assignment on
detached predictions and all avg_factor plumbing), pos_acc, and the video
track losses — must match.

This composition test subsumes the formula-level (test_loss_parity),
target-level (test_target_parity), assignment (test_topk_assign) and
activation (test_reference_parity) oracles: any divergence in GT prep,
assignment plumbing, loss weighting, or normalization across the WHOLE
training step fails here.
"""
from __future__ import annotations

import os
import sys

import numpy as np
import pytest

REF = "/root/reference"
pytestmark = pytest.mark.skipif(not os.path.isdir(REF),
                                reason="reference tree unavailable")

H, W = 128, 256  # divisible by 32; stride-4 GT = 32x64


def _install():
    sys.path.insert(0, os.path.join(os.path.dirname(__file__), "refshim"))
    import ref_loader

    return ref_loader.install()


def make_frame(rng, n_things, inst_ids, stuff_classes, h=H, w=W):
    """Synthetic full-resolution GT frame: disjoint stuff bands with thing
    rectangles painted on top — the dataset's real layout (binary masks,
    thing labels < 8, stuff labels 8..18, positive depth with invalid
    zeros).  Returns the `frame` dict data/pipeline.frame_to_sample eats."""
    segs = []  # (mask, label, inst_id)
    nb = len(stuff_classes)
    for k, c in enumerate(stuff_classes):
        m = np.zeros((h, w), np.float32)
        m[k * h // nb:(k + 1) * h // nb] = 1.0
        segs.append([m, int(c), -1])
    slot_w = w // max(n_things, 1)
    for i in range(n_things):
        label = int(rng.randint(0, 8))
        x0 = i * slot_w + 4
        x1 = x0 + int(rng.randint(slot_w // 3, slot_w - 8))
        y0 = int(rng.randint(4, h // 2))
        y1 = y0 + int(rng.randint(h // 4, h // 2 - 4))
        tm = np.zeros((h, w), np.float32)
        tm[y0:y1, x0:x1] = 1.0
        for s in segs:
            s[0] = s[0] * (1.0 - tm)
        segs.append([tm, label, int(inst_ids[i])])
    # drop stuff bands a thing fully covered
    segs = [s for s in segs if s[0].sum() > 0]
    masks = [s[0] for s in segs]
    labels = np.asarray([s[1] for s in segs], np.int64)
    ids = np.asarray([s[2] for s in segs], np.int64)
    depth = (rng.rand(h, w).astype(np.float32) * 60 + 1)
    depth[rng.rand(h, w) < 0.15] = 0.0
    img = rng.randn(h, w, 3).astype(np.float32)
    return dict(img=img, masks=masks, labels=labels, inst_ids=ids,
                depth=depth)


def _ref_gt_args(frame):
    """frame dict -> the torch/mmdet GT containers forward_train eats."""
    import torch
    from mmdet.core.mask.structures import BitmapMasks

    bm = BitmapMasks([m.astype(np.uint8) for m in frame["masks"]], H, W)
    labels = torch.from_numpy(frame["labels"])
    ids = torch.from_numpy(frame["inst_ids"])
    depth = torch.from_numpy(frame["depth"])[None, None]  # (1, 1, H, W)
    img = torch.from_numpy(np.transpose(frame["img"], (2, 0, 1)))[None]
    meta = dict(img_shape=(H, W, 3), ori_shape=(H, W, 3), scale_factor=1.0,
                flip=False)
    return img, [meta], bm, labels, ids, depth


def _our_gt(frame, cfg):
    import jax
    import jax.numpy as jnp

    from polyphonicformer_tpu.data.loader import _collate_gt
    from polyphonicformer_tpu.data.pipeline import frame_to_sample

    sample = frame_to_sample(
        dict(img=frame["img"], labels=frame["labels"],
             masks=frame["masks"], inst_ids=frame["inst_ids"],
             depth=frame["depth"]), cfg, (H, W))
    gt = _collate_gt([sample])
    return jax.tree_util.tree_map(jnp.asarray, gt), sample


def _train_cfg_dict():
    """Shipped train_cfg (configs/_base_/models/polyphonic_former.py:166-196)."""
    return dict(
        rpn=dict(
            assigner=dict(
                type="MaskHungarianAssignerWithDepth",
                cls_cost=dict(type="FocalLossCost", weight=2.0),
                dice_cost=dict(type="DiceCost", weight=4.0, pred_act=True),
                mask_cost=dict(type="MaskCost", weight=1.0, pred_act=True)),
            sampler=dict(type="MaskPseudoSampler"),
            pos_weight=1.0),
        rcnn=dict(
            assigner=dict(
                type="MaskHungarianAssignerWithDepth",
                cls_cost=dict(type="FocalLossCost", weight=2.0),
                dice_cost=dict(type="DiceCost", weight=4.0, pred_act=True),
                mask_cost=dict(type="MaskCost", weight=1.0, pred_act=True),
                depth_cost=dict(
                    type="DepthCost", weight=0.0,
                    loss_fn=dict(type="DepthMatchLoss", loss_weight=1.0),
                    depth_act_mode="sigmoid")),
            sampler=dict(type="MaskPseudoSampler"),
            pos_weight=1.0))


# reference loss-dict key -> our loss-dict key (None = metric we also emit)
def _keymap(n_stages=3, video=False):
    m = {
        "loss_rpn_mask": "loss_rpn_mask",
        "loss_rpn_dice": "loss_rpn_dice",
        "loss_rpn_rank": "loss_rpn_rank",
        "loss_rpn_seg": "loss_rpn_seg",
        "loss_depth": "loss_rpn_depth",
        "depth_dense": "loss_rpn_depth_dense",
    }
    for i in range(n_stages):
        m[f"s{i}_loss_cls"] = f"s{i}_loss_cls"
        m[f"s{i}_pos_acc"] = f"s{i}_pos_acc"
        m[f"s{i}_loss_rpn_mask"] = f"s{i}_loss_mask"
        m[f"s{i}_loss_rpn_dice"] = f"s{i}_loss_dice"
        m[f"s{i}_loss_rank"] = f"s{i}_loss_rank"
        m[f"s{i}_loss_depth"] = f"s{i}_loss_depth"
    if video:
        m["loss_track"] = "loss_track"
        m["loss_track_aux"] = "loss_track_aux"
    return m


def _compare_loss_dicts(ref_losses, our_losses, video=False):
    keymap = _keymap(video=video)
    missing_map = sorted(set(ref_losses) - set(keymap))
    assert not missing_map, (
        f"reference emits loss keys this test does not map: {missing_map}")
    unconsumed = sorted(set(k for k in our_losses) - set(keymap.values()))
    assert not unconsumed, (
        f"our loss dict has entries the reference does not emit: {unconsumed}")
    rows = []
    for rk, ok in keymap.items():
        assert ok in our_losses, f"missing our-side key {ok}"
        want = float(ref_losses[rk])
        got = float(our_losses[ok])
        rows.append((rk, want, got))
    # per-entry gate: tight relative tolerance with a small absolute floor
    # (fp32 accumulation-order noise through a 50-layer network)
    for rk, want, got in rows:
        tol = 1e-3 * max(abs(want), 1.0) + 2e-3
        assert abs(got - want) <= tol, (
            f"{rk}: ref {want:.6f} vs ours {got:.6f} (tol {tol:.2e})\n"
            + "\n".join(f"  {r}: ref {a:.6f} ours {b:.6f}"
                        for r, a, b in rows))
    # totals, using the reference's ACTUAL optimized-sum rule: mmdet's
    # _parse_losses sums only keys containing 'loss'
    # (/root/reference/mmdet/models/detectors/base.py:198-200), which
    # excludes pos_acc AND depth_dense (kernel_head.py:438)
    want_total = sum(w for k, w, _ in rows if "loss" in k)
    got_total = sum(g for k, _, g in rows if "loss" in k)
    np.testing.assert_allclose(got_total, want_total, rtol=2e-3)


@pytest.fixture(scope="module")
def image_case():
    """Reference image model WITH train_cfg at torch random init + its loss
    dict on a synthetic real-layout batch."""
    import torch

    poly = _install()
    from test_reference_parity import _as_cfg, _reference_model_cfg

    torch.manual_seed(0)
    cfg = _as_cfg(_reference_model_cfg())
    tcfg = _as_cfg(_train_cfg_dict())
    model = poly.Polyphonic(
        backbone=cfg["backbone"], neck=cfg["neck"], rpn_head=cfg["rpn_head"],
        roi_head=cfg["roi_head"], train_cfg=tcfg, test_cfg=cfg["test_cfg"],
        num_thing_classes=cfg["num_thing_classes"],
        num_stuff_classes=cfg["num_stuff_classes"])
    model.train()  # norm_eval=True keeps BN frozen; dropout is 0.0

    rng = np.random.RandomState(5)
    frame = make_frame(rng, n_things=5, inst_ids=[11, 12, 13, 14, 15],
                       stuff_classes=[8, 9, 11, 13, 16, 18])
    img, metas, bm, labels, _, depth = _ref_gt_args(frame)
    with torch.no_grad():
        ref_losses = model.forward_train(
            img, metas, gt_labels=[labels], gt_masks=[bm], gt_depth=depth)
    ref_losses = {k: float(v) for k, v in ref_losses.items()}
    sd = {k: v.numpy() for k, v in model.state_dict().items()}
    return dict(state_dict=sd, frame=frame, ref_losses=ref_losses)


def test_image_train_loss_dict_parity(image_case):
    import jax
    import jax.numpy as jnp

    from polyphonicformer_tpu.configs import ModelConfig
    from polyphonicformer_tpu.models import PolyphonicFormer
    from polyphonicformer_tpu.tools.convert_torch_ckpt import \
        convert_state_dict
    from polyphonicformer_tpu.train.losses import compute_losses

    cfg = ModelConfig()
    model = PolyphonicFormer(cfg)
    variables = jax.tree_util.tree_map(
        jnp.asarray, convert_state_dict(image_case["state_dict"], cfg))
    gt, _ = _our_gt(image_case["frame"], cfg)
    img = jnp.asarray(image_case["frame"]["img"])[None]

    @jax.jit
    def run(variables, img, gt):
        feats = model.apply(variables, img,
                            method=PolyphonicFormer.extract_feat)
        out = model.apply(variables, feats,
                          method=PolyphonicFormer.forward_heads)
        return compute_losses(cfg, out, gt)

    total, losses = run(variables, img, gt)
    our_losses = {k: float(v) for k, v in losses.items()}
    _compare_loss_dicts(image_case["ref_losses"], our_losses)
    # our total must equal the sum it optimizes
    from polyphonicformer_tpu.train.losses import is_metric_key
    want = sum(v for k, v in our_losses.items() if not is_metric_key(k))
    np.testing.assert_allclose(float(total), want, rtol=1e-5)


@pytest.fixture(scope="module")
def video_case():
    """Reference PolyphonicVideo WITH train_cfg + track_train_cfg at torch
    random init + its loss dict on an identical 2-frame batch
    (polyphonic_former_video.py:70-325: GT prep -> rpn loss -> no-grad ref
    branch -> 3-stage re-assignment -> track assignment/sampling -> track
    losses)."""
    import torch

    poly = _install()
    from test_reference_parity import _as_cfg, _reference_model_cfg

    torch.manual_seed(3)
    cfg = _reference_model_cfg()
    # video config deltas (configs/polyphonic_video/poly_r50_cityscapes_1x.py)
    cfg["rpn_head"]["loss_depth"]["loss_weight"] = 1.0
    cfg["roi_head"]["tracking"] = True
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
    cfg = _as_cfg(cfg)
    model = poly.PolyphonicVideo(
        backbone=cfg["backbone"], neck=cfg["neck"], rpn_head=cfg["rpn_head"],
        roi_head=cfg["roi_head"], train_cfg=_as_cfg(_train_cfg_dict()),
        test_cfg=cfg["test_cfg"],
        num_thing_classes=cfg["num_thing_classes"],
        num_stuff_classes=cfg["num_stuff_classes"],
        track_head=_as_cfg(track_head),
        bbox_roi_extractor=_as_cfg(bbox_roi_extractor),
        track_train_cfg=_as_cfg(track_train_cfg), tracker=None)
    model.train()

    rng = np.random.RandomState(9)
    # 3 shared instance ids (21, 22, 24), one key-only (23), one ref-only (99)
    key = make_frame(rng, n_things=4, inst_ids=[21, 22, 23, 24],
                     stuff_classes=[8, 10, 12, 15, 17])
    ref = make_frame(rng, n_things=4, inst_ids=[22, 21, 99, 24],
                     stuff_classes=[8, 10, 13, 15, 18])

    import torch

    img_k, metas, bm_k, labels_k, ids_k, depth_k = _ref_gt_args(key)
    img_r, _, bm_r, labels_r, ids_r, depth_r = _ref_gt_args(ref)
    meta_r = dict(metas[0])
    # ref_* GT arrives frame-stacked from the dataset: (N, 2) [frame, value]
    labels_r2 = torch.stack([torch.zeros_like(labels_r), labels_r], dim=1)
    ids_r2 = torch.stack([torch.zeros_like(ids_r), ids_r], dim=1)
    with torch.no_grad():
        ref_losses = model.forward_train(
            img_k, metas,
            gt_labels=[labels_k], gt_masks=[bm_k], gt_depth=depth_k,
            ref_img=img_r[:, None],  # (1, 1, 3, H, W)
            ref_img_metas=[[meta_r]],
            ref_gt_bboxes=[[torch.zeros((len(labels_r), 4))]],
            ref_gt_labels=[labels_r2],
            ref_gt_masks=[[bm_r]],
            ref_gt_semantic_seg=torch.zeros((1, 1, 1, H, W)),
            ref_gt_depth=depth_r[:, None],  # (1, 1, 1, H, W)
            gt_instance_ids=[ids_k],
            ref_gt_instance_ids=[ids_r2])
    ref_losses = {k: float(v) for k, v in ref_losses.items()}
    sd = {k: v.numpy() for k, v in model.state_dict().items()}
    return dict(state_dict=sd, key=key, ref=ref, ref_losses=ref_losses)


def test_video_train_loss_dict_parity(video_case):
    import jax
    import jax.numpy as jnp

    from polyphonicformer_tpu.configs import get_preset
    from polyphonicformer_tpu.data.structures import TrainBatch
    from polyphonicformer_tpu.models import PolyphonicFormer
    from polyphonicformer_tpu.tools.convert_torch_ckpt import \
        convert_state_dict
    from polyphonicformer_tpu.train.video_losses import video_forward_losses

    mc = get_preset("video_r50_1x").model
    model = PolyphonicFormer(mc)
    variables = jax.tree_util.tree_map(
        jnp.asarray, convert_state_dict(video_case["state_dict"], mc))
    gt_k, _ = _our_gt(video_case["key"], mc)
    gt_r, _ = _our_gt(video_case["ref"], mc)
    batch = TrainBatch(
        image=jnp.asarray(video_case["key"]["img"])[None],
        gt=gt_k,
        ref_image=jnp.asarray(video_case["ref"]["img"])[None],
        ref_gt=gt_r)

    @jax.jit
    def run(variables, batch):
        return video_forward_losses(model, variables, mc, batch)

    total, losses = run(variables, batch)
    our_losses = {k: float(v) for k, v in losses.items()}
    _compare_loss_dicts(video_case["ref_losses"], our_losses, video=True)
    from polyphonicformer_tpu.train.losses import is_metric_key
    want = sum(v for k, v in our_losses.items() if not is_metric_key(k))
    np.testing.assert_allclose(float(total), want, rtol=1e-5)
