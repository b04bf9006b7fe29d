from .panoptic import PanopticResult, fuse_panoptic, segments_info_host
from .tracker import TrackerState, bbox_iou, init_tracker_state, tracker_step
