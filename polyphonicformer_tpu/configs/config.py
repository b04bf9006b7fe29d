"""Typed configuration for PolyphonicFormer-TPU.

This replaces the reference's mmcv ``Config`` + registry-string system
(/root/reference/configs/_base_/models/polyphonic_former.py) with plain frozen
dataclasses composed in three layers (model / data / train), plus flat
dotted-path overrides for CLI use.
"""
from __future__ import annotations

import dataclasses
from typing import Any, Optional, Sequence, Tuple


@dataclasses.dataclass(frozen=True)
class DepthLossConfig:
    # reference: configs/_base_/models/polyphonic_former.py:70-77
    loss_weight: float = 5.0
    depth_act_mode: str = "sigmoid"  # 'sigmoid' | 'monodepth'
    si_weight: float = 1.0
    sq_rel_weight: float = 1.0
    abs_rel_weight: float = 1.0
    min_depth: float = 0.01
    max_depth: float = 80.0


@dataclasses.dataclass(frozen=True)
class AssignerConfig:
    # reference: configs/_base_/models/polyphonic_former.py:168-196
    cls_weight: float = 2.0
    dice_weight: float = 4.0
    mask_weight: float = 1.0
    depth_weight: float = 0.0
    focal_gamma: float = 2.0
    focal_alpha: float = 0.25
    # >1 matches each GT to its best `topk` prediction rows (successive
    # Hungarian rounds, matched rows masked out between rounds) —
    # reference: funcs/assigner.py:330-344.  Shipped configs use 1.
    topk: int = 1


@dataclasses.dataclass(frozen=True)
class TrackerConfig:
    # reference: configs/polyphonic_video/poly_r50_cityscapes_1x.py:51-64
    init_score_thr: float = 0.35
    obj_score_thr: float = 0.3
    match_score_thr: float = 0.5
    memo_tracklet_frames: int = 5
    memo_backdrop_frames: int = 1
    memo_momentum: float = 0.8
    nms_conf_thr: float = 0.5
    nms_backdrop_iou_thr: float = 0.3
    nms_class_iou_thr: float = 0.7
    with_cats: bool = True
    match_metric: str = "bisoftmax"
    # static capacities (TPU-native additions; the reference grows lists)
    max_tracklets: int = 128
    max_detections: int = 64
    max_backdrops: int = 64


@dataclasses.dataclass(frozen=True)
class TrackHeadConfig:
    # reference: configs/polyphonic_video/poly_r50_cityscapes_1x.py:36-50
    num_convs: int = 4
    num_fcs: int = 1
    roi_feat_size: int = 7
    in_channels: int = 256
    conv_out_channels: int = 256
    fc_out_channels: int = 1024
    embed_channels: int = 256
    gn_groups: int = 32
    loss_track_weight: float = 0.25
    loss_aux_weight: float = 1.0
    aux_neg_pos_ub: int = 3
    aux_pos_margin: float = 0.0
    aux_neg_margin: float = 0.1
    aux_hard_mining: bool = True
    softmax_temp: float = -1.0
    roi_sampling_ratio: int = 2
    featmap_strides: Tuple[int, ...] = (4, 8, 16, 32)
    finest_scale: int = 56
    # RoIAlign formulation: "gather" = flattened-pyramid gather (default —
    # measured fastest end-to-end on v5e, tools_dev/bench_track_variants.py:
    # 164 vs 172 ms/step; the scatter-add backward is NOT a bottleneck at
    # these ROI counts); "separable" = per-level interpolation matmuls
    # (MXU fwd+bwd, identical to ~1e-4 — kept for larger-ROI regimes).
    roi_impl: str = "gather"


@dataclasses.dataclass(frozen=True)
class ModelConfig:
    """Hyper-parameters of the full model.

    Mirrors every knob in the reference's shipped configs
    (configs/_base_/models/polyphonic_former.py:1-209).
    """

    # global structure
    num_thing_classes: int = 8
    num_stuff_classes: int = 11
    num_proposals: int = 100
    num_stages: int = 3
    conv_kernel_size: int = 1
    mask_assign_stride: int = 4
    ignore_label: int = 255

    # backbone / neck
    backbone: str = "resnet50"
    frozen_stages: int = 1
    fpn_out_channels: int = 256

    # channels
    in_channels: int = 256
    out_channels: int = 256
    num_heads: int = 8
    feedforward_channels: int = 2048

    # semantic fpn wrapper
    sem_fpn_start_level: int = 0
    sem_fpn_end_level: int = 3
    sem_fpn_upsample_times: int = 2
    sem_fpn_num_aux_convs: int = 2
    sem_fpn_gn_groups: int = 32
    sem_fpn_positional_encoding_num_feats: int = 128

    # kernel update head
    hard_mask_thr: float = 0.5
    mask_upsample_stride: int = 2
    num_cls_fcs: int = 1
    num_mask_fcs: int = 1
    with_ffn: bool = True
    depth_act_mode: str = "sigmoid"

    # loss weights (rpn = KernelHead, rcnn = KernelUpdateHead)
    loss_rank_weight: float = 0.1
    loss_seg_weight: float = 1.0
    loss_mask_weight: float = 1.0
    loss_dice_weight: float = 4.0
    loss_cls_weight: float = 2.0
    focal_gamma: float = 2.0
    focal_alpha: float = 0.25
    rpn_depth_loss: DepthLossConfig = DepthLossConfig(loss_weight=5.0)
    rcnn_depth_loss: DepthLossConfig = DepthLossConfig(loss_weight=5.0)

    # assigners
    rpn_assigner: AssignerConfig = AssignerConfig()
    rcnn_assigner: AssignerConfig = AssignerConfig()

    # test cfg (configs/_base_/models/polyphonic_former.py:197-209)
    max_per_img: int = 100
    mask_thr: float = 0.5
    overlap_thr: float = 0.6
    instance_score_thr: float = 0.3
    # bf16 Pallas fusion: thing rows given full render capacity; the rest
    # (score-sorted, below instance_score_thr in practice) are prune-folded
    # into an exact max channel (infer/panoptic.py, phase_fusion n_full).
    # 53 + 11 stuff = 64 rows. >= max_per_img disables the prune.
    fusion_full_things: int = 53

    # semantic_out_cfg ASPP auxiliary semantic head (reference
    # kernel_head.py:203-211,307-309,561-566; registered capability, off in
    # every shipped config)
    with_semantic_aspp: bool = False
    aspp_dilations: tuple = (1, 6, 12, 18)
    loss_aspp_weight: float = 1.0

    # video additions
    with_track: bool = False
    track_head: TrackHeadConfig = TrackHeadConfig()
    tracker: TrackerConfig = TrackerConfig()

    # static shape capacities (TPU-native)
    max_things: int = 64  # max GT thing instances per image after padding

    # SemKITTI-DVPS mode: GT masks downsample with nearest instead of
    # bilinear (reference polyphonic_former.py:77-80, semantic_kitti flag)
    semantic_kitti: bool = False

    # numerics
    compute_dtype: str = "float32"  # 'bfloat16' for inference/serving
    # rematerialize backbone blocks in the backward pass (trades FLOPs for
    # HBM — required for full-res 1024x2048 training on one chip)
    remat_backbone: bool = True
    # tensor-shard the backbone (Swin only) over the 'model' mesh axis:
    # Dense kernels carry flax logical-axis metadata (models/swin.py
    # SWIN_LOGICAL_RULES) so multi-chip serving can shard Swin-L
    shard_backbone: bool = False

    @property
    def num_classes(self) -> int:
        return self.num_thing_classes + self.num_stuff_classes

    @property
    def num_queries(self) -> int:
        """Proposals + stuff kernels after cat_stuff_mask."""
        return self.num_proposals + self.num_stuff_classes


@dataclasses.dataclass(frozen=True)
class DataConfig:
    # reference: configs/_base_/datasets/cityscapes_dvps.py
    data_root: str = "data/cityscapes-dvps"
    split: str = "train"
    ref_sample_mode: str = "random"
    ref_seq_index: Tuple[int, ...] = ()
    img_size: Tuple[int, int] = (1024, 2048)  # (H, W) crop / pad target
    ratio_range: Tuple[float, float] = (1.0, 2.0)
    flip_ratio: float = 0.5
    size_divisor: int = 32
    mean: Tuple[float, float, float] = (123.675, 116.28, 103.53)
    std: Tuple[float, float, float] = (58.395, 57.12, 57.375)
    max_depth: float = 80.0
    repeat_times: int = 8
    batch_size: int = 8  # global batch
    num_workers: int = 8
    check_id_match: int = 80000
    shuffle: bool = True
    seed: int = 0


@dataclasses.dataclass(frozen=True)
class ScheduleConfig:
    # reference: configs/_base_/schedules/schedule_{1x,2x}.py
    lr: float = 1e-4
    weight_decay: float = 0.05
    backbone_lr_mult: float = 0.25
    grad_clip_norm: float = 1.0
    warmup_iters: int = 1000
    warmup_ratio: float = 0.001
    lr_decay_epochs: Tuple[int, ...] = (16, 22)
    lr_decay_factor: float = 0.1
    total_epochs: int = 24
    checkpoint_interval: int = 1
    max_keep_checkpoints: int = 2
    log_interval: int = 50


@dataclasses.dataclass(frozen=True)
class ParallelConfig:
    """Mesh layout. data-parallel by default; model axis reserved for
    large backbones (Swin-L) sharding."""

    data_axis: str = "data"
    model_axis: str = "model"
    num_data: int = -1  # -1: all devices
    num_model: int = 1


@dataclasses.dataclass(frozen=True)
class ExperimentConfig:
    model: ModelConfig = ModelConfig()
    data: DataConfig = DataConfig()
    schedule: ScheduleConfig = ScheduleConfig()
    parallel: ParallelConfig = ParallelConfig()
    work_dir: str = "work_dirs/default"
    seed: int = 0
    load_from: Optional[str] = None
    resume: bool = False


def _replace_path(obj: Any, path: Sequence[str], value: Any) -> Any:
    if not path:
        return value
    field_name = path[0]
    sub = getattr(obj, field_name)
    new_sub = _replace_path(sub, path[1:], value)
    return dataclasses.replace(obj, **{field_name: new_sub})


def apply_overrides(cfg: Any, overrides: dict) -> Any:
    """Apply flat dotted-path overrides, e.g. {'schedule.lr': 2e-4}.

    Values are coerced to the existing field's type where sensible; this is
    the equivalent of the reference's ``--cfg-options``
    (tools/train.py:64-73).
    """
    for key, value in overrides.items():
        path = key.split(".")
        # coerce strings
        node = cfg
        for p in path[:-1]:
            node = getattr(node, p)
        old = getattr(node, path[-1])
        if isinstance(value, str) and old is not None and not isinstance(old, str):
            if isinstance(old, bool):
                value = value.lower() in ("1", "true", "yes")
            elif isinstance(old, int):
                value = int(value)
            elif isinstance(old, float):
                value = float(value)
            elif isinstance(old, tuple):
                elt = type(old[0]) if old else float
                # accept both "a,b" and "(a,b)" / "[a,b]" spellings
                value = tuple(elt(v) for v in
                              value.strip("()[] ").split(","))
        cfg = _replace_path(cfg, path, value)
    return cfg
