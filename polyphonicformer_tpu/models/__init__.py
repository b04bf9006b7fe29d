from .fpn import FPN
from .kernel_head import KernelHead, RPNOutput
from .kernel_update_head import KernelUpdateHead, StageOutput
from .kernel_updator import KernelUpdator
from .polyphonic import ModelOutput, PolyphonicFormer
from .resnet import ResNet
from .semantic_fpn import SemanticFPNWrapper
from .track_head import TrackHead
