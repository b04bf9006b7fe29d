from .focal import sigmoid_focal_loss, softmax_focal_loss
from .roi_align import RoIAlign, roi_align
from .deform_conv import DeformConv2d, DeformConv2dPack
