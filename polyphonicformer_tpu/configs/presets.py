"""Preset experiment configs mirroring the reference's shipped leaf configs."""
from __future__ import annotations

import dataclasses

from .config import (
    DataConfig,
    DepthLossConfig,
    ExperimentConfig,
    ModelConfig,
    ScheduleConfig,
)


def image_r50_2x() -> ExperimentConfig:
    """Image model, 24-epoch schedule.

    reference: configs/polyphonic_image/poly_r50_cityscapes_2x.py
    (8 GPUs x bs 1, AdamW lr 1e-4).
    """
    return ExperimentConfig(
        model=ModelConfig(with_track=False),
        data=DataConfig(ref_sample_mode="random", ref_seq_index=(), repeat_times=8,
                        batch_size=8),
        schedule=ScheduleConfig(lr=1e-4, total_epochs=24, lr_decay_epochs=(16, 22)),
        work_dir="work_dirs/poly_r50_image_2x",
    )


def video_r50_1x() -> ExperimentConfig:
    """Video model (2-frame training + tracking), 12-epoch schedule.

    reference: configs/polyphonic_video/poly_r50_cityscapes_1x.py
    (8 GPUs x bs 2, AdamW lr 2e-4, rpn depth loss weight 1.0).
    """
    model = ModelConfig(
        with_track=True,
        rpn_depth_loss=DepthLossConfig(loss_weight=1.0),
    )
    return ExperimentConfig(
        model=model,
        data=DataConfig(ref_sample_mode="random", ref_seq_index=(-2, -1, 1, 2),
                        repeat_times=4, batch_size=16),
        schedule=ScheduleConfig(lr=2e-4, total_epochs=12, lr_decay_epochs=(8, 11)),
        work_dir="work_dirs/poly_r50_video_1x",
    )


def video_r50_semkitti_1x() -> ExperimentConfig:
    """SemKITTI-DVPS video model (reference's semantic_kitti mode: nearest GT
    downsampling; the dataset shares the video_sequence layout)."""
    cfg = video_r50_1x()
    model = dataclasses.replace(cfg.model, semantic_kitti=True)
    data = dataclasses.replace(cfg.data, data_root="data/semkitti-dvps",
                               img_size=(384, 1248), ratio_range=(1.0, 2.0))
    return dataclasses.replace(cfg, model=model, data=data,
                               work_dir="work_dirs/poly_r50_semkitti_1x")


def video_swinl() -> ExperimentConfig:
    """Swin-L video model for batched multi-clip serving on a v5e slice
    (BASELINE.json config #5)."""
    cfg = video_r50_1x()
    model = dataclasses.replace(cfg.model, backbone="swin_large",
                                compute_dtype="bfloat16")
    return dataclasses.replace(cfg, model=model,
                               work_dir="work_dirs/poly_swinl_video")


def debug_tiny() -> ExperimentConfig:
    """Small model + small crops for CI / smoke tests on CPU."""
    model = ModelConfig(out_channels=64, in_channels=64, fpn_out_channels=64,
                        feedforward_channels=128, num_proposals=20,
                        max_things=8)
    data = DataConfig(img_size=(128, 256), ratio_range=(1.0, 1.1),
                      batch_size=1, num_workers=1, repeat_times=1)
    return ExperimentConfig(
        model=model, data=data,
        schedule=ScheduleConfig(lr=1e-4, warmup_iters=10, total_epochs=1,
                                lr_decay_epochs=(1,), log_interval=1),
        work_dir="work_dirs/debug_tiny")


def debug_tiny_video() -> ExperimentConfig:
    cfg = debug_tiny()
    model = dataclasses.replace(cfg.model, with_track=True)
    data = dataclasses.replace(cfg.data, ref_sample_mode="random",
                               ref_seq_index=(-1, 1))
    return dataclasses.replace(cfg, model=model, data=data)


PRESETS = {
    "image_r50_2x": image_r50_2x,
    "video_r50_1x": video_r50_1x,
    "video_r50_semkitti_1x": video_r50_semkitti_1x,
    "video_swinl": video_swinl,
    "debug_tiny": debug_tiny,
    "debug_tiny_video": debug_tiny_video,
}


def get_preset(name: str, **replacements) -> ExperimentConfig:
    cfg = PRESETS[name]()
    if replacements:
        cfg = dataclasses.replace(cfg, **replacements)
    return cfg
