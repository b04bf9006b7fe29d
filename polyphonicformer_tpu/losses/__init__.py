from .cross_entropy import (
    binary_cross_entropy_with_logits,
    masked_bce_mean,
    softmax_ce_ignore,
)
from .depth_loss import depth_loss, depth_loss_raw
from .dice import dice_loss_per_row
from .focal import sigmoid_focal_loss, sigmoid_focal_loss_elements
from .track import l2_aux_loss, multi_pos_cross_entropy
