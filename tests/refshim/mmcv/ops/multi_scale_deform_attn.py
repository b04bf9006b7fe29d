"""Import-only stub: mmdet/models/utils/transformer.py imports this; the
Swin/Polyphonic graph never instantiates it."""
import torch.nn as nn


class MultiScaleDeformableAttention(nn.Module):
    def __init__(self, *args, **kwargs):
        super().__init__()
        raise NotImplementedError(
            "refshim: MultiScaleDeformableAttention is import-only")
