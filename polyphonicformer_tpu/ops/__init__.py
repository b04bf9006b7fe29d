from .depth import depth_act
from .hungarian import gt2pred_to_assignment, match_gt_to_preds, solve_lsa
from .resize import (
    resize_bilinear,
    resize_bilinear_nhwc,
    resize_nearest,
    upsample2x_nearest_nhwc,
)
from .roi_align import (
    map_roi_levels,
    masks_to_boxes_mad,
    multilevel_roi_align,
    roi_align_level,
)
