"""Video-path parity against the REAL reference code (tests/refshim loader).

Covers the three video-specific claims round 1 left untested:
  1. track-embedding path: real SingleRoIExtractor + QuasiDenseMaskEmbed
     HeadGTMask vs our masks->MAD-boxes->multilevel RoIAlign->TrackHead with
     converted weights (polyphonic_former_video.py:406-419);
  2. the COMPOSED track loss: the reference's full sequence (Hungarian track
     assignment -> MaskPseudoSampler -> GT-mask pooling -> match ->
     get_track_targets -> MultiPosCE + hard-mined L2) vs our direct-GT-slot
     shortcut (train/video_losses.py:4-11) — validating the
     permutation-invariance argument numerically (VERDICT r1 item 9);
  3. the streaming tracker: real QuasiDenseEmbedTracker vs our static-table
     lax.scan tracker over a multi-frame synthetic sequence.
"""
from __future__ import annotations

import os
import sys

import numpy as np
import pytest

REF = "/root/reference"
pytestmark = pytest.mark.skipif(not os.path.isdir(REF),
                                reason="reference tree unavailable")

PAD_H, PAD_W = 64, 128  # input resolution (stride-4 GT: 16x32)


def _install():
    sys.path.insert(0, os.path.join(os.path.dirname(__file__), "refshim"))
    import ref_loader

    return ref_loader.install()


def _rect_mask(h, w, y0, y1, x0, x1):
    m = np.zeros((h, w), np.float32)
    m[y0:y1, x0:x1] = 1.0
    return m


def _make_gt(rng, n_inst, ids, h4=PAD_H // 4, w4=PAD_W // 4):
    """Disjoint rectangle GT masks at stride 4 + labels + instance ids."""
    masks, labels = [], []
    for i in range(n_inst):
        y0 = (i * h4) // n_inst
        y1 = ((i + 1) * h4) // n_inst
        x0 = rng.randint(0, w4 // 2)
        x1 = x0 + rng.randint(4, w4 // 2)
        masks.append(_rect_mask(h4, w4, y0, max(y0 + 2, y1), x0, x1))
        labels.append(rng.randint(0, 8))
    return (np.stack(masks), np.asarray(labels, np.int64),
            np.asarray(ids, np.int64))


@pytest.fixture(scope="module")
def pieces():
    """Real reference track modules at default random init + the converted
    flax track-head params."""
    import torch

    poly = _install()
    import importlib

    builder = importlib.import_module("mmdet.models.builder")
    bbox_builder = importlib.import_module("mmdet.core.bbox.builder")
    from mmcv.utils import ConfigDict

    torch.manual_seed(7)
    track_head = builder.HEADS.build(ConfigDict(dict(
        type="QuasiDenseMaskEmbedHeadGTMask", num_convs=4, num_fcs=1,
        embed_channels=256, norm_cfg=ConfigDict(dict(type="GN", num_groups=32)),
        loss_track=ConfigDict(dict(type="MultiPosCrossEntropyLoss",
                                   loss_weight=0.25)),
        loss_track_aux=ConfigDict(dict(type="L2Loss", neg_pos_ub=3,
                                       pos_margin=0, neg_margin=0.1,
                                       hard_mining=True, loss_weight=1.0)))))
    roi_extractor = builder.ROI_EXTRACTORS.build(ConfigDict(dict(
        type="SingleRoIExtractor",
        roi_layer=ConfigDict(dict(type="RoIAlign", output_size=7,
                                  sampling_ratio=2)),
        out_channels=256, featmap_strides=[4, 8, 16, 32])))
    assigner = bbox_builder.build_assigner(ConfigDict(dict(
        type="MaskHungarianAssigner",
        cls_cost=ConfigDict(dict(type="FocalLossCost", weight=2.0)),
        dice_cost=ConfigDict(dict(type="DiceCost", weight=4.0, pred_act=True)),
        mask_cost=ConfigDict(dict(type="MaskCost", weight=1.0,
                                  pred_act=True)))))
    import polyphonic.funcs.sampler as sampler_mod

    sampler = sampler_mod.MaskPseudoSampler()
    track_head.eval()
    roi_extractor.eval()

    # converted flax params for OUR TrackHead (track_head.* subtree only)
    from polyphonicformer_tpu.tools.convert_torch_ckpt import (
        _transform, build_param_mapping, unflatten_tree)

    sd = {f"track_head.{k}": v.detach().numpy()
          for k, v in track_head.state_dict().items()}
    mapping = build_param_mapping(3, "resnet50", with_track=True)
    flat = {}
    for fp, (tk, kind) in mapping.items():
        if not fp.startswith("track_head/"):
            continue
        flat[fp.split("/", 1)[1]] = _transform(np.asarray(sd[tk]), kind)
    flax_params = {"params": unflatten_tree(flat)}
    return dict(track_head=track_head, roi_extractor=roi_extractor,
                assigner=assigner, sampler=sampler, flax_params=flax_params,
                poly=poly)


def _ref_track_forward(pieces, feats_torch, masks_list):
    """Verbatim PolyphonicVideo._track_forward (training branch),
    polyphonic_former_video.py:406-419."""
    import importlib

    utils = importlib.import_module("polyphonic.video.utils")
    bbox_list = utils.batch_mask2boxlist(masks_list)
    rois = utils.bboxlist2roi(bbox_list).clamp(min=0.0)
    rex = pieces["roi_extractor"]
    feats = rex(feats_torch[:rex.num_inputs], rois)
    return pieces["track_head"](feats)


def _pyramid(rng, b=1, c=256):
    shapes = [(PAD_H // s, PAD_W // s) for s in (4, 8, 16, 32)]
    return [rng.randn(b, c, h, w).astype(np.float32) * 0.5 for h, w in shapes]


def test_track_embed_parity(pieces):
    """masks -> boxes -> RoIAlign -> embed head, real vs ours."""
    import torch

    import jax
    import jax.numpy as jnp

    from polyphonicformer_tpu.configs import ModelConfig
    from polyphonicformer_tpu.models.track_head import TrackHead

    rng = np.random.RandomState(3)
    feats_np = _pyramid(rng)
    masks4, _, _ = _make_gt(rng, 4, [1, 2, 3, 4])
    # upsample to input resolution + binarize, as the reference does before
    # _track_forward (polyphonic_former_video.py:283-291)
    import torch.nn.functional as F

    masks_up = F.interpolate(torch.from_numpy(masks4)[None], size=(PAD_H, PAD_W),
                             mode="bilinear", align_corners=False)[0]
    masks_bin = (masks_up.sigmoid() > 0.5).float()

    with torch.no_grad():
        ref_embeds = _ref_track_forward(
            pieces, [torch.from_numpy(f) for f in feats_np],
            [masks_bin]).numpy()

    cfg = ModelConfig(with_track=True)
    head = TrackHead(cfg.track_head)
    feats_nhwc = tuple(jnp.asarray(np.transpose(f, (0, 2, 3, 1)))
                       for f in feats_np)
    valid = jnp.ones((1, 4), bool)
    ours = head.apply(pieces["flax_params"], feats_nhwc,
                      jnp.asarray(masks_bin.numpy())[None], valid)
    ours = np.asarray(ours)[0]
    d = np.abs(ours - ref_embeds)
    scale = np.abs(ref_embeds).std()
    assert d.max() / scale < 2e-3, (
        f"track embeds: max {d.max():.2e} scale {scale:.2f}")


def test_composed_track_loss_parity(pieces):
    """The full reference track-loss path vs our GT-slot shortcut."""
    import torch
    import torch.nn.functional as F

    import jax.numpy as jnp

    from polyphonicformer_tpu.configs import ModelConfig
    from polyphonicformer_tpu.data.structures import GTSample
    from polyphonicformer_tpu.models.track_head import TrackHead
    from polyphonicformer_tpu.train.video_losses import (gt_track_masks,
                                                         track_pair_losses)

    rng = np.random.RandomState(11)
    n_key, n_ref = 5, 4
    # instance ids: 3 shared, others unmatched
    key_masks4, key_labels, key_ids = _make_gt(rng, n_key, [10, 11, 12, 13, 14])
    ref_masks4, ref_labels, ref_ids = _make_gt(rng, n_ref, [12, 10, 99, 11])

    num_props = 100
    h8, w8 = PAD_H // 8, PAD_W // 8
    h4, w4 = PAD_H // 4, PAD_W // 4
    feats_np = _pyramid(rng)
    ref_feats_np = _pyramid(rng)

    def rand_preds():
        scaled = rng.randn(num_props, h4, w4).astype(np.float32)
        preds8 = rng.randn(num_props, h8, w8).astype(np.float32)
        cls = rng.randn(num_props, 8).astype(np.float32)
        return scaled, preds8, cls

    key_scaled, key_preds8, key_cls = rand_preds()
    ref_scaled, ref_preds8, ref_cls = rand_preds()

    # ---------------- reference composed path (former_video.py:246-319) ----
    with torch.no_grad():
        gt_match_indices = []
        ref_ids_l = ref_ids.tolist()
        gt_pids = [ref_ids_l.index(i) if i in ref_ids_l else -1
                   for i in key_ids.tolist()]
        gt_match_indices.append(torch.LongTensor(gt_pids))

        def assign_sample(scaled, cls, preds8, gmasks, glabels):
            ar = pieces["assigner"].assign(
                torch.from_numpy(scaled), torch.from_numpy(cls),
                torch.from_numpy(gmasks), torch.from_numpy(glabels),
                img_meta=None)
            return pieces["sampler"].sample(
                ar, torch.from_numpy(preds8), torch.from_numpy(gmasks))

        key_res = assign_sample(key_scaled, key_cls, key_preds8,
                                key_masks4, key_labels)
        ref_res = assign_sample(ref_scaled, ref_cls, ref_preds8,
                                ref_masks4, ref_labels)

        def pooled_masks(res):
            m = F.interpolate(res.pos_gt_masks.unsqueeze(0),
                              size=(PAD_H, PAD_W), mode="bilinear",
                              align_corners=False).squeeze(0)
            return (m.sigmoid() > 0.5).float()

        key_feats = _ref_track_forward(
            pieces, [torch.from_numpy(f) for f in feats_np],
            [pooled_masks(key_res)])
        ref_feats = _ref_track_forward(
            pieces, [torch.from_numpy(f) for f in ref_feats_np],
            [pooled_masks(ref_res)])
        th = pieces["track_head"]
        match_feats = th.match(key_feats, ref_feats, [key_res], [ref_res])
        asso_targets = th.get_track_targets(gt_match_indices, [key_res],
                                            [ref_res])
        ref_losses = th.loss(*match_feats, *asso_targets)
        ref_losses = {k: float(v) for k, v in ref_losses.items()}

    # ---------------- our path --------------------------------------------
    cfg = ModelConfig(with_track=True)
    m = 8  # padded capacity

    def pad_gt(masks4, labels, ids, n):
        pm = np.zeros((m, h4, w4), np.float32)
        pl = np.full((m,), -1, np.int32)
        pi = np.full((m,), -1, np.int32)
        pm[:n] = masks4
        pl[:n] = labels
        pi[:n] = ids
        valid = np.arange(m) < n
        return GTSample(
            thing_masks=jnp.asarray(pm), thing_labels=jnp.asarray(pl),
            thing_valid=jnp.asarray(valid), thing_inst_ids=jnp.asarray(pi),
            stuff_masks=jnp.zeros((1, h4, w4)), stuff_valid=jnp.zeros((1,), bool),
            depth=jnp.zeros((h4, w4)), valid_mask=jnp.zeros((h4, w4)))

    key_gt = pad_gt(key_masks4, key_labels, key_ids, n_key)
    ref_gt = pad_gt(ref_masks4, ref_labels, ref_ids, n_ref)
    import jax

    batched = lambda gt: jax.tree_util.tree_map(lambda x: x[None], gt)
    key_gt_b, ref_gt_b = batched(key_gt), batched(ref_gt)

    head = TrackHead(cfg.track_head)
    feats_nhwc = tuple(jnp.asarray(np.transpose(f, (0, 2, 3, 1)))
                       for f in feats_np)
    ref_feats_nhwc = tuple(jnp.asarray(np.transpose(f, (0, 2, 3, 1)))
                           for f in ref_feats_np)
    key_m = gt_track_masks(key_gt_b, (PAD_H, PAD_W))
    ref_m = gt_track_masks(ref_gt_b, (PAD_H, PAD_W))
    key_e = head.apply(pieces["flax_params"], feats_nhwc, key_m,
                       key_gt_b.thing_valid)
    ref_e = head.apply(pieces["flax_params"], ref_feats_nhwc, ref_m,
                       ref_gt_b.thing_valid)
    ours = track_pair_losses(cfg, key_e, ref_e, key_gt_b, ref_gt_b)

    got_track = float(ours["loss_track"]) / cfg.track_head.loss_track_weight
    got_aux = float(ours["loss_track_aux"]) / cfg.track_head.loss_aux_weight
    want_track = ref_losses["loss_track"] / 0.25
    want_aux = ref_losses["loss_track_aux"]
    np.testing.assert_allclose(got_track, want_track, rtol=2e-3,
                               err_msg="composed loss_track")
    np.testing.assert_allclose(got_aux, want_aux, rtol=2e-3,
                               err_msg="composed loss_track_aux")


def test_real_tracker_parity(pieces):
    """Stream 6 synthetic frames through the REAL QuasiDenseEmbedTracker and
    our static-capacity tracker; per-frame ids must agree."""
    import importlib

    import torch

    import jax.numpy as jnp

    from polyphonicformer_tpu.configs import TrackerConfig
    from polyphonicformer_tpu.infer.tracker import (init_tracker_state,
                                                    tracker_step)

    trackers = importlib.import_module(
        "polyphonic.video.qdtrack.trackers.quasi_dense_embed_tracker")
    real = trackers.QuasiDenseEmbedTracker(
        init_score_thr=0.35, obj_score_thr=0.3, match_score_thr=0.5,
        memo_tracklet_frames=5, memo_backdrop_frames=1, memo_momentum=0.8,
        nms_conf_thr=0.5, nms_backdrop_iou_thr=0.3, nms_class_iou_thr=0.7,
        with_cats=True, match_metric="bisoftmax")

    cfg = TrackerConfig(max_tracklets=32, max_detections=8, max_backdrops=8)
    state = init_tracker_state(cfg, embed_dim=16)

    rng = np.random.RandomState(5)
    # 4 persistent identities with stable embedding directions
    base = rng.randn(4, 16).astype(np.float32) * 4
    frames = []
    for t in range(6):
        n = 4 if t % 2 == 0 else 3
        boxes = []
        embeds = []
        labels = []
        for i in range(n):
            x0 = 10 + 30 * i + rng.randint(-2, 3)
            y0 = 10 + rng.randint(-2, 3)
            score = 0.9 - 0.1 * i + rng.rand() * 0.05
            boxes.append([x0, y0, x0 + 20, y0 + 20, score])
            embeds.append(base[i] + rng.randn(16).astype(np.float32) * 0.05)
            labels.append(i % 3)
        frames.append((np.asarray(boxes, np.float32),
                       np.asarray(labels, np.int64),
                       np.stack(embeds)))

    for fid, (boxes, labels, embeds) in enumerate(frames, start=1):
        n = boxes.shape[0]
        with torch.no_grad():
            rb, rl, rids = real.match(torch.from_numpy(boxes),
                                      torch.from_numpy(labels),
                                      torch.from_numpy(embeds),
                                      frame_id=fid)
        # real tracker returns score-desc sorted, duplicate-filtered rows
        d = cfg.max_detections
        pb = np.zeros((d, 5), np.float32)
        pl = np.zeros((d,), np.int32)
        pe = np.zeros((d, 16), np.float32)
        pv = np.zeros((d,), bool)
        pb[:n], pl[:n], pe[:n], pv[:n] = boxes, labels, embeds, True
        state, ids_sorted, order, kept_sorted = tracker_step(
            cfg, state, jnp.asarray(pb), jnp.asarray(pl), jnp.asarray(pe),
            jnp.asarray(pv), jnp.int32(fid))
        ids_sorted = np.asarray(ids_sorted)
        order = np.asarray(order)
        kept = np.asarray(kept_sorted)

        # map real rows back: real sorted by score desc over the same dets
        real_order = np.argsort(-boxes[:, 4], kind="stable")
        rids = rids.numpy()
        got = {}
        for row, det_idx in enumerate(order):
            if kept[row] and det_idx < n:
                got[int(det_idx)] = int(ids_sorted[row])
        want = {int(real_order[r]): int(rids[r]) for r in range(len(rids))}
        for det_idx, rid in want.items():
            if rid >= 0:
                assert got.get(det_idx) == rid, (
                    f"frame {fid} det {det_idx}: real id {rid}, "
                    f"ours {got.get(det_idx)} (want/got {want}/{got})")
