"""DeformConv2d(Pack) shim: constructible (so registered-but-unused reference
modules import and build), forward raises — nothing in the shipped configs
reaches deformable conv at run time (/root/reference SURVEY §2.3)."""
from __future__ import annotations

import torch.nn as nn


class DeformConv2d(nn.Module):
    def __init__(self, in_channels, out_channels, kernel_size, stride=1,
                 padding=0, dilation=1, groups=1, deform_groups=1, bias=False):
        super().__init__()
        if isinstance(kernel_size, int):
            kernel_size = (kernel_size, kernel_size)
        self.kernel_size = kernel_size
        self.stride = stride
        self.padding = padding
        import torch

        self.weight = nn.Parameter(
            torch.empty(out_channels, in_channels // groups, *kernel_size))
        nn.init.kaiming_uniform_(self.weight, a=5 ** 0.5)

    def forward(self, x, offset):
        raise NotImplementedError(
            "mmcv shim: deformable conv forward not implemented (unused by "
            "shipped reference configs)")


class DeformConv2dPack(DeformConv2d):
    def __init__(self, *args, **kwargs):
        super().__init__(*args, **kwargs)
        self.conv_offset = nn.Conv2d(
            self.weight.shape[1],
            2 * self.kernel_size[0] * self.kernel_size[1],
            kernel_size=self.kernel_size, stride=self.stride,
            padding=self.padding, bias=True)
        nn.init.zeros_(self.conv_offset.weight)
        nn.init.zeros_(self.conv_offset.bias)

    def forward(self, x):
        raise NotImplementedError(
            "mmcv shim: deformable conv forward not implemented (unused by "
            "shipped reference configs)")
