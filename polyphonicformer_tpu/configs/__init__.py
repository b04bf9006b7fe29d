from .config import (
    AssignerConfig,
    DataConfig,
    DepthLossConfig,
    ExperimentConfig,
    ModelConfig,
    ParallelConfig,
    ScheduleConfig,
    TrackerConfig,
    TrackHeadConfig,
    apply_overrides,
)
from .presets import PRESETS, get_preset, image_r50_2x, video_r50_1x

__all__ = [
    "AssignerConfig",
    "DataConfig",
    "DepthLossConfig",
    "ExperimentConfig",
    "ModelConfig",
    "ParallelConfig",
    "ScheduleConfig",
    "TrackerConfig",
    "TrackHeadConfig",
    "apply_overrides",
    "PRESETS",
    "get_preset",
    "image_r50_2x",
    "video_r50_1x",
]
