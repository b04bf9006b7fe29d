"""Feature Pyramid Network, NHWC.

reference: /root/reference/mmdet/models/necks/fpn.py:11-203 with
in_channels=[256,512,1024,2048], out=256, num_outs=4
(configs/_base_/models/polyphonic_former.py:22-29).  With num_outs == number
of inputs, the 'on_input' extra-conv branch is never exercised; top-down
upsampling is nearest (mmdet default).
"""
from __future__ import annotations

from typing import Sequence, Tuple

import flax.linen as nn
import jax

from ..ops.resize import upsample2x_nearest_nhwc


class FPN(nn.Module):
    out_channels: int = 256
    num_levels: int = 4

    @nn.compact
    def __call__(self, inputs: Sequence[jax.Array]) -> Tuple[jax.Array, ...]:
        assert len(inputs) == self.num_levels
        laterals = [
            nn.Conv(self.out_channels, (1, 1), name=f"lateral_{i}",
                    kernel_init=nn.initializers.xavier_uniform())(inputs[i])
            for i in range(self.num_levels)
        ]
        for i in range(self.num_levels - 1, 0, -1):
            laterals[i - 1] = laterals[i - 1] + upsample2x_nearest_nhwc(laterals[i])
        outs = [
            nn.Conv(self.out_channels, (3, 3), padding="SAME", name=f"fpn_{i}",
                    kernel_init=nn.initializers.xavier_uniform())(laterals[i])
            for i in range(self.num_levels)
        ]
        return tuple(outs)
