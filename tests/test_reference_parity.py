"""Full-network numerical parity against the REAL reference model.

The genuine reference source (/root/reference/polyphonic/*.py plus the
vendored mmdet leaf modules it imports) is loaded through the pure-torch
mmcv shim in tests/refshim/, instantiated with the shipped config
(configs/_base_/models/polyphonic_former.py), left at torch's default random
init, and run on CPU in eval mode.  Its state_dict is pushed through
tools/convert_torch_ckpt.convert_state_dict and the SAME input is run
through this framework; activations must agree per module and end to end:

  ResNet/FPN feats -> KernelHead init proposals -> 3 KernelUpdateHead stages
  -> get_panoptic panoptic/semantic/depth maps.

This is the no-download version of the checkpoint-parity gate (BASELINE.md):
any divergence in resize conventions, attention layout, gate order, or the
converter mapping fails here.
"""
from __future__ import annotations

import os
import sys

import numpy as np
import pytest

REF = "/root/reference"
pytestmark = pytest.mark.skipif(not os.path.isdir(REF),
                                reason="reference tree unavailable")

H, W = 128, 256  # divisible by 32; small enough for 1-core CPU


def _as_cfg(d):
    sys.path.insert(0, os.path.join(os.path.dirname(__file__), "refshim"))
    from mmcv.utils import ConfigDict

    if isinstance(d, dict):
        return ConfigDict({k: _as_cfg(v) for k, v in d.items()})
    if isinstance(d, (list, tuple)):
        return type(d)(_as_cfg(v) for v in d)
    return d


def _reference_model_cfg(with_video=False):
    """Shipped model config, minus losses/train_cfg (inference parity).
    Source: /root/reference/configs/_base_/models/polyphonic_former.py and
    configs/polyphonic_video/poly_r50_cityscapes_1x.py."""
    num_stages, num_proposals, conv_kernel_size = 3, 100, 1
    nt, ns = 8, 11
    cfg = dict(
        num_thing_classes=nt,
        num_stuff_classes=ns,
        backbone=dict(type="ResNet", depth=50, num_stages=4,
                      out_indices=(0, 1, 2, 3), frozen_stages=1,
                      norm_cfg=dict(type="BN", requires_grad=True),
                      norm_eval=True, style="pytorch"),
        neck=dict(type="FPN", in_channels=[256, 512, 1024, 2048],
                  out_channels=256, start_level=0,
                  add_extra_convs="on_input", num_outs=4),
        rpn_head=dict(
            type="KernelHead", num_proposals=num_proposals,
            num_classes=nt + ns, num_thing_classes=nt, num_stuff_classes=ns,
            in_channels=256, out_channels=256, num_heads=8, num_cls_fcs=1,
            num_seg_convs=1, num_loc_convs=1,
            conv_kernel_size=conv_kernel_size, with_depth=True,
            cat_stuff_mask=True, feat_downsample_stride=2,
            feat_refine_stride=1, feat_refine=False, use_binary=True,
            num_depth_convs=1, conv_normal_init=True,
            proposal_feats_with_obj=True, xavier_init_kernel=False,
            kernel_init_std=1, feat_transform_cfg=None,
            loss_rank=dict(type="CrossEntropyLoss", use_sigmoid=False,
                           loss_weight=0.1),
            loss_seg=dict(type="FocalLoss", use_sigmoid=True, gamma=2.0,
                          alpha=0.25, loss_weight=1.0),
            loss_mask=dict(type="CrossEntropyLoss", use_sigmoid=True,
                           loss_weight=1.0),
            loss_dice=dict(type="DiceLoss", loss_weight=4.0),
            loss_depth=dict(type="DepthLoss", loss_weight=5.0,
                            depth_act_mode="sigmoid", si_weight=1.0,
                            sq_rel_weight=1.0, abs_rel_weight=1.0),
            localization_fpn=dict(
                type="SemanticFPNWrapper", in_channels=256,
                feat_channels=256, out_channels=256, start_level=0,
                end_level=3, upsample_times=2,
                positional_encoding=dict(type="SinePositionalEncoding",
                                         num_feats=128, normalize=True),
                cat_coors=False, cat_coors_level=3, fuse_by_cat=False,
                return_list=False, num_aux_convs=2,
                norm_cfg=dict(type="GN", num_groups=32, requires_grad=True)),
        ),
        roi_head=dict(
            type="KernelUpdateIterHead", num_stages=num_stages,
            assign_stages=num_stages, recursive=False,
            stage_loss_weights=[1] * num_stages,
            proposal_feature_channel=256, num_proposals=num_proposals,
            num_thing_classes=nt, num_stuff_classes=ns, do_panoptic=True,
            merge_joint=True,
            mask_head=dict(
                type="KernelUpdateHead", num_thing_classes=nt,
                num_stuff_classes=ns, num_classes=nt + ns, num_ffn_fcs=2,
                num_heads=8, num_cls_fcs=1, num_mask_fcs=1,
                feedforward_channels=2048, in_channels=256, out_channels=256,
                dropout=0.0, mask_thr=0.5,
                conv_kernel_size=conv_kernel_size, mask_upsample_stride=2,
                ffn_act_cfg=dict(type="ReLU", inplace=True), with_ffn=True,
                feat_transform_cfg=dict(conv_cfg=dict(type="Conv2d"),
                                        act_cfg=None),
                kernel_updator_cfg=dict(type="KernelUpdator", in_channels=256,
                                        feat_channels=256, out_channels=256,
                                        input_feat_shape=3,
                                        act_cfg=dict(type="ReLU",
                                                     inplace=True),
                                        norm_cfg=dict(type="LN")),
                loss_rank=dict(type="CrossEntropyLoss", use_sigmoid=False,
                               loss_weight=0.1),
                loss_mask=dict(type="CrossEntropyLoss", use_sigmoid=True,
                               loss_weight=1.0),
                loss_dice=dict(type="DiceLoss", loss_weight=4.0),
                loss_cls=dict(type="FocalLoss", use_sigmoid=True, gamma=2.0,
                              alpha=0.25, loss_weight=2.0),
                loss_depth=dict(type="DepthLoss", loss_weight=5.0,
                                depth_act_mode="sigmoid", si_weight=1.0,
                                sq_rel_weight=1.0, abs_rel_weight=1.0),
                depth_act_mode="sigmoid")),
        train_cfg=None,
        test_cfg=dict(
            rpn=None,
            rcnn=dict(max_per_img=num_proposals, mask_thr=0.5,
                      stuff_score_thr=0.05,
                      merge_stuff_thing=dict(overlap_thr=0.6, iou_thr=0.5,
                                             stuff_max_area=4096,
                                             instance_score_thr=0.3))),
    )
    if with_video:
        # poly_r50_cityscapes_1x.py:36-71 (track head + roi extractor)
        cfg["track_head"] = dict(
            type="QuasiDenseMaskEmbedHeadGTMask", num_convs=4, num_fcs=1,
            embed_channels=256, norm_cfg=dict(type="GN", num_groups=32),
            loss_track=dict(type="MultiPosCrossEntropy", loss_weight=0.25),
            loss_track_aux=dict(type="L2Loss", neg_pos_ub=3,
                                pos_margin=0, neg_margin=0.1,
                                hard_mining=True, loss_weight=1.0))
        cfg["roi_extractor"] = dict(
            type="SingleRoIExtractor",
            roi_layer=dict(type="RoIAlign", output_size=7, sampling_ratio=2),
            out_channels=256, featmap_strides=[4, 8, 16, 32])
        cfg["tracker_cfg"] = dict(
            type="QuasiDenseEmbedTracker", init_score_thr=0.35,
            obj_score_thr=0.3, match_score_thr=0.5, memo_tracklet_frames=5,
            memo_backdrop_frames=1, memo_momentum=0.8, nms_conf_thr=0.5,
            nms_backdrop_iou_thr=0.3, nms_class_iou_thr=0.7,
            with_cats=True, match_metric="bisoftmax")
    return cfg


@pytest.fixture(scope="module")
def ref_side():
    """Reference model (random init, eval) + its activations, all numpy."""
    import torch

    sys.path.insert(0, os.path.join(os.path.dirname(__file__), "refshim"))
    import ref_loader

    poly = ref_loader.install()
    torch.manual_seed(0)
    cfg = _as_cfg(_reference_model_cfg())
    model = poly.Polyphonic(
        backbone=cfg["backbone"], neck=cfg["neck"], rpn_head=cfg["rpn_head"],
        roi_head=cfg["roi_head"], train_cfg=None, test_cfg=cfg["test_cfg"],
        num_thing_classes=cfg["num_thing_classes"],
        num_stuff_classes=cfg["num_stuff_classes"])
    model.eval()

    rng = np.random.RandomState(42)
    img = rng.randn(1, 3, H, W).astype(np.float32)
    img_metas = [dict(img_shape=(H, W, 3), batch_input_shape=(H, W),
                      ori_shape=(H, W, 3), scale_factor=1.0, flip=False)]

    acts = {}
    with torch.no_grad():
        x = model.extract_feat(torch.from_numpy(img))
        acts["fpn"] = [f.numpy() for f in x]
        rpn = model.rpn_head.simple_test_rpn(x, img_metas)
        (proposal_feats, x_feats, mask_preds, cls_scores, seg_preds,
         depth_feats, depth_proposal, depth_pred, aspp) = rpn
        acts["rpn_proposal_feats"] = proposal_feats.numpy()
        acts["rpn_x_feats"] = x_feats.numpy()
        acts["rpn_mask_preds"] = mask_preds.numpy()
        acts["rpn_seg_preds"] = seg_preds.numpy()
        acts["rpn_depth_pred"] = depth_pred.numpy()
        acts["rpn_depth_proposal"] = depth_proposal.numpy()
        acts["rpn_depth_feats"] = depth_feats.numpy()

        # stage loop exactly as KernelUpdateIterHead.simple_test
        import torch.nn.functional as F

        roi = model.roi_head
        depth_inital = depth_pred.clone().detach()
        depth_preds_in = depth_pred.expand(-1, depth_proposal.shape[1], -1, -1)
        depth_inital = F.interpolate(depth_inital, scale_factor=2,
                                     mode="bilinear", align_corners=False)
        object_feats = proposal_feats
        mask_p = mask_preds
        depth_prop = depth_proposal
        depth_p = depth_preds_in
        stages = []
        for stage in range(roi.num_stages):
            stage_in = dict(obj=object_feats.numpy(), mask=mask_p.numpy(),
                            depth_prop=depth_prop.numpy())
            mr = roi._mask_forward(stage, x_feats, object_feats, mask_p,
                                   img_metas, depth_p, depth_prop,
                                   depth_feats)
            object_feats = mr["object_feats"]
            cls_score = mr["cls_score"]
            mask_p = mr["mask_preds"]
            depth_prop = mr["depth_proposal"]
            depth_p = mr["depth_preds"]
            stages.append(dict(cls=cls_score.numpy(), mask=mask_p.numpy(),
                               depth=depth_p.numpy(),
                               scaled_mask=mr["scaled_mask_preds"].numpy(),
                               scaled_depth=mr["scaled_depth_preds"].numpy(),
                               inputs=stage_in,
                               obj_out=object_feats.numpy(),
                               depth_kernels_out=depth_prop.numpy()))
        acts["stages"] = stages

        cls_final = cls_score.sigmoid()
        pano = roi.get_panoptic(cls_final[0], mr["scaled_mask_preds"][0],
                                roi.test_cfg, img_metas[0],
                                depth_preds=mr["scaled_depth_preds"][0],
                                depth_init=depth_inital[0], aspp_semantic=None)
        _, _, (panoptic_seg, segments_info), depth_basic, depth_final = pano
        acts["panoptic"] = panoptic_seg
        acts["segments_info"] = segments_info
        acts["depth_basic"] = depth_basic
        acts["depth_final"] = depth_final

    sd = {k: v.numpy() for k, v in model.state_dict().items()}
    return {"state_dict": sd, "acts": acts, "img": img}


@pytest.fixture(scope="module")
def our_side(ref_side):
    import jax
    import jax.numpy as jnp

    from polyphonicformer_tpu.configs import ModelConfig
    from polyphonicformer_tpu.infer.panoptic import fuse_panoptic
    from polyphonicformer_tpu.models import PolyphonicFormer
    from polyphonicformer_tpu.ops.resize import resize_bilinear
    from polyphonicformer_tpu.tools.convert_torch_ckpt import \
        convert_state_dict

    cfg = ModelConfig()
    model = PolyphonicFormer(cfg)
    variables = convert_state_dict(ref_side["state_dict"], cfg)
    variables = jax.tree_util.tree_map(jnp.asarray, variables)

    img = jnp.asarray(np.transpose(ref_side["img"], (0, 2, 3, 1)))

    @jax.jit
    def run(variables, img):
        fpn = model.apply(variables, img, method=PolyphonicFormer.extract_feat)
        out = model.apply(variables, fpn, method=PolyphonicFormer.forward_heads)
        return fpn, out

    fpn, out = run(variables, img)
    s = out.stages[-1]
    mask_logits = resize_bilinear(
        s.mask_preds[0], (s.mask_preds.shape[-2] * 2,
                          s.mask_preds.shape[-1] * 2))
    depth_logits = resize_bilinear(
        s.depth_preds[0], (s.depth_preds.shape[-2] * 2,
                           s.depth_preds.shape[-1] * 2))
    depth_init = resize_bilinear(
        out.rpn.depth_pred[0:1], (out.rpn.depth_pred.shape[-2] * 2,
                                  out.rpn.depth_pred.shape[-1] * 2))[0]
    pano = jax.jit(lambda c, m, d, d0: fuse_panoptic(
        cfg, c, m, d, d0, (H, W)))(jax.nn.sigmoid(s.cls_score[0]),
                                   mask_logits, depth_logits, depth_init)
    return {"cfg": cfg, "fpn": fpn, "out": out, "pano": pano,
            "variables": variables}


def test_state_dict_keys_bijective(ref_side):
    """Converter mapping == the real reference model's parameter set."""
    from polyphonicformer_tpu.configs import ModelConfig
    from polyphonicformer_tpu.tools.convert_torch_ckpt import \
        build_param_mapping

    mapping = build_param_mapping(3, "resnet50", with_track=False)
    torch_keys = {tk for tk, _ in mapping.values()}
    ref_keys = {k for k in ref_side["state_dict"]
                if not k.endswith("num_batches_tracked")}
    missing = sorted(torch_keys - ref_keys)
    extra = sorted(ref_keys - torch_keys)
    assert not missing, f"converter expects keys absent in reference: {missing[:8]}"
    assert not extra, f"reference params unmapped by converter: {extra[:8]}"


def _nhwc(a):
    return np.transpose(np.asarray(a), (0, 3, 1, 2))


def test_backbone_fpn_parity(ref_side, our_side):
    for i, (ref, ours) in enumerate(zip(ref_side["acts"]["fpn"],
                                        our_side["fpn"])):
        np.testing.assert_allclose(_nhwc(ours), ref, rtol=1e-4, atol=1e-4,
                                   err_msg=f"FPN level {i}")


def test_kernel_head_parity(ref_side, our_side):
    acts = ref_side["acts"]
    rpn = our_side["out"].rpn
    np.testing.assert_allclose(_nhwc(rpn.x_feats), acts["rpn_x_feats"],
                               rtol=1e-4, atol=1e-4, err_msg="x_feats")
    np.testing.assert_allclose(np.asarray(rpn.mask_preds),
                               acts["rpn_mask_preds"], rtol=1e-4, atol=1e-4,
                               err_msg="init mask preds")
    np.testing.assert_allclose(np.asarray(rpn.proposal_feats),
                               acts["rpn_proposal_feats"][..., 0, 0]
                               if acts["rpn_proposal_feats"].ndim == 5
                               else acts["rpn_proposal_feats"],
                               rtol=1e-4, atol=1e-4, err_msg="proposal feats")
    np.testing.assert_allclose(np.asarray(rpn.depth_pred),
                               acts["rpn_depth_pred"][:, 0], rtol=1e-4,
                               atol=1e-4, err_msg="dense depth")


def test_stage_parity(ref_side, our_side):
    # Two noise sources make bit-tight comparison impossible at random init:
    # fp32 accumulation orders differ (einsum dynamic conv vs grouped
    # F.conv2d), and the hard-mask pooling threshold (sigmoid > 0.5,
    # kernel_update_head.py:236-239) binarizes logits that sit at ~0.5
    # everywhere under random weights, so 1e-6 conv noise flips border
    # pixels and discretely perturbs the pooled query features.  Gate on the
    # error distribution: overwhelmingly tiny, no large outliers.
    for s, ref in enumerate(ref_side["acts"]["stages"]):
        ours = our_side["out"].stages[s]
        for key, a, b in (("cls", ours.cls_score, ref["cls"]),
                          ("mask", ours.mask_preds, ref["mask"]),
                          ("depth", ours.depth_preds,
                           ref["depth"][:, :, 0] if ref["depth"].ndim == 5
                           else ref["depth"])):
            d = np.abs(np.asarray(a) - b)
            frac_big = (d > 1e-2).mean()
            assert d.mean() < 5e-3 and frac_big < 0.01 and d.max() < 0.5, (
                f"stage {s} {key}: max {d.max():.2e} mean {d.mean():.2e} "
                f"frac>1e-2 {frac_big:.2%}")


def test_stage_parity_teacher_forced(ref_side, our_side):
    """Run OUR stage-s head on the REFERENCE's stage-s inputs: isolates each
    stage's semantics from compounding/chaotic upstream noise.  This is the
    tight per-stage gate; the composed test above covers drift."""
    import jax
    import jax.numpy as jnp

    from polyphonicformer_tpu.models import PolyphonicFormer

    cfg = our_side["cfg"]
    model = PolyphonicFormer(cfg)
    variables = our_side["variables"]
    acts = ref_side["acts"]
    x_feats = jnp.asarray(np.transpose(acts["rpn_x_feats"], (0, 2, 3, 1)))
    depth_feats = jnp.asarray(
        np.transpose(acts["rpn_depth_feats"], (0, 2, 3, 1)))

    def run_stage(s, obj, mask, dprop):
        def fn(mdl):
            return mdl.mask_heads[s](x_feats, obj, mask, dprop, depth_feats)

        return nn_apply(model, variables, fn)

    import flax.linen as nn_linen

    def nn_apply(model, variables, fn):
        return nn_linen.apply(fn, model)(variables)

    for s, ref in enumerate(acts["stages"]):
        inp = ref["inputs"]
        obj = inp["obj"]
        if obj.ndim == 5:
            obj = obj[..., 0, 0]
        dprop = inp["depth_prop"]
        if dprop.ndim == 5:
            dprop = dprop[..., 0, 0]
        # the reference couples depth kernels as dprop + obj.detach() INSIDE
        # the head; our head does the same, so pass the raw inputs
        out = run_stage(s, jnp.asarray(obj), jnp.asarray(inp["mask"]),
                        jnp.asarray(dprop))
        for key, a, b in (("cls", out.cls_score, ref["cls"]),
                          ("mask", out.mask_preds, ref["mask"]),
                          ("depth", out.depth_preds,
                           ref["depth"][:, :, 0] if ref["depth"].ndim == 5
                           else ref["depth"]),
                          ("obj_out", out.obj_feats,
                           ref["obj_out"][..., 0, 0]
                           if ref["obj_out"].ndim == 5 else ref["obj_out"]),
                          ("depth_kernels", out.depth_kernels,
                           ref["depth_kernels_out"][..., 0, 0]
                           if ref["depth_kernels_out"].ndim == 5
                           else ref["depth_kernels_out"])):
            d = np.abs(np.asarray(a) - b)
            scale = max(np.abs(b).std(), 1e-3)
            assert d.max() / scale < 2e-3, (
                f"teacher-forced stage {s} {key}: max {d.max():.2e} "
                f"(scale {scale:.2f}, rel {d.max() / scale:.2e})")


def test_panoptic_parity(ref_side, our_side):
    acts = ref_side["acts"]
    pano = our_side["pano"]
    ref_pan = acts["panoptic"]
    our_pan = np.asarray(pano.panoptic)
    mismatch = (ref_pan != our_pan).mean()
    assert mismatch < 1e-3, f"panoptic maps differ on {mismatch:.2%} of pixels"
    np.testing.assert_allclose(np.asarray(pano.depth_basic),
                               acts["depth_basic"][0]
                               if acts["depth_basic"].ndim == 3
                               else acts["depth_basic"],
                               rtol=1e-3, atol=1e-3, err_msg="depth basic")
    dref = acts["depth_final"]
    dref = dref[0] if dref.ndim == 3 else dref
    dours = np.asarray(pano.depth)
    bad = np.abs(dours - dref) > (1e-3 + 1e-3 * np.abs(dref))
    assert bad.mean() < 1e-3, f"depth differs on {bad.mean():.2%} of pixels"

    # segments_info equivalence
    from polyphonicformer_tpu.infer.panoptic import segments_info_host

    ours_info = segments_info_host(pano, 8)
    ref_info = acts["segments_info"]
    assert len(ours_info) == len(ref_info)
    for a, b in zip(ours_info, ref_info):
        assert a["id"] == b["id"] and a["isthing"] == b["isthing"]
        assert a["category_id"] == b["category_id"]

def test_parity_check_converts_real_torch_save_file(ref_side, tmp_path):
    """The parity runbook's convert stage ingests a REAL torch.save file
    (mmcv CheckpointHook layout: {'state_dict':..., 'meta':...}) — the
    exact artifact shape of the published checkpoints
    (/root/reference/README.md:76,86) — and produces variables identical
    to the in-memory conversion used by the activation-parity tests."""
    import pickle

    import jax
    import torch

    from polyphonicformer_tpu.configs import ModelConfig
    from polyphonicformer_tpu.tools.convert_torch_ckpt import \
        convert_state_dict
    from polyphonicformer_tpu.tools.parity_check import convert_checkpoint

    sd_t = {k: torch.from_numpy(np.asarray(v))
            for k, v in ref_side["state_dict"].items()}
    pth = tmp_path / "polyphonic_r50_image.pth"
    torch.save({"state_dict": sd_t,
                "meta": {"mmdet_version": "2.20.0",
                         "CLASSES": ("person", "rider")}}, str(pth))

    out_pkl = str(tmp_path / "image_vars.pkl")
    convert_checkpoint(str(pth), out_pkl, video=False)
    with open(out_pkl, "rb") as f:
        from_file = pickle.load(f)

    want = convert_state_dict(ref_side["state_dict"], ModelConfig())
    flat_a = jax.tree_util.tree_leaves_with_path(from_file)
    flat_b = jax.tree_util.tree_leaves_with_path(want)
    assert len(flat_a) == len(flat_b)
    for (pa, a), (pb, b) in zip(flat_a, flat_b):
        assert pa == pb
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b),
                                      err_msg=str(pa))
