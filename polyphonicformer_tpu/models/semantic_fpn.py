"""SemanticFPNWrapper: fuse FPN P2..P5 into one stride-8 map with three
output branches (localization / semantic / depth).

reference: /root/reference/polyphonic/funcs/semantic_fpn.py:16-235 with
start_level=0, end_level=3, upsample_times=2, num_aux_convs=2, GN(32),
sine positional encoding added at level 3
(configs/_base_/models/polyphonic_former.py:78-96).

Tower structure for the shipped config (output stride 8):
  P2 (s4):  conv3x3 stride-2
  P3 (s8):  conv3x3
  P4 (s16): conv3x3 -> up2x -> conv3x3
  P5 (s32): (+PE) conv3x3 -> up2x -> conv3x3 -> up2x -> conv3x3
summed, then 1x1 conv_pred (loc) and two 1x1 aux convs (semantic, depth).
"""
from __future__ import annotations

from typing import Sequence, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp

from ..ops.resize import resize_bilinear_nhwc
from .layers import ConvNormAct, sine_positional_encoding

_NORMAL01 = nn.initializers.normal(stddev=0.01)


class SemanticFPNWrapper(nn.Module):
    feat_channels: int = 256
    out_channels: int = 256
    gn_groups: int = 32
    pe_num_feats: int = 0  # 0 -> feat_channels // 2 (=128 for the R50 config)
    num_aux_convs: int = 2

    @nn.compact
    def __call__(self, feats: Sequence[jax.Array],
                 towers_only: bool = False) -> Tuple[jax.Array, ...]:
        """``towers_only`` (static): return just the fused stride-8 map,
        skipping the pred/aux 1x1 branches — perf-breakdown tooling only."""
        p2, p3, p4, p5 = feats
        g = self.gn_groups
        c = self.feat_channels

        # level 0: downsample stride-2 conv
        t0 = ConvNormAct(c, 3, strides=2, gn_groups=g, name="lvl0_conv0",
                         kernel_init=_NORMAL01)(p2)
        # level 1: single conv
        t1 = ConvNormAct(c, 3, gn_groups=g, name="lvl1_conv0",
                         kernel_init=_NORMAL01)(p3)
        # level 2: conv -> up -> conv
        t2 = ConvNormAct(c, 3, gn_groups=g, name="lvl2_conv0",
                         kernel_init=_NORMAL01)(p4)
        t2 = resize_bilinear_nhwc(t2, (t2.shape[1] * 2, t2.shape[2] * 2))
        t2 = ConvNormAct(c, 3, gn_groups=g, name="lvl2_conv1",
                         kernel_init=_NORMAL01)(t2)
        # level 3: PE + conv -> up -> conv -> up -> conv
        pe = sine_positional_encoding(p5.shape[1], p5.shape[2],
                                      num_feats=self.pe_num_feats or c // 2,
                                      dtype=p5.dtype)
        t3 = p5 + pe[None]
        t3 = ConvNormAct(c, 3, gn_groups=g, name="lvl3_conv0",
                         kernel_init=_NORMAL01)(t3)
        t3 = resize_bilinear_nhwc(t3, (t3.shape[1] * 2, t3.shape[2] * 2))
        t3 = ConvNormAct(c, 3, gn_groups=g, name="lvl3_conv1",
                         kernel_init=_NORMAL01)(t3)
        t3 = resize_bilinear_nhwc(t3, (t3.shape[1] * 2, t3.shape[2] * 2))
        t3 = ConvNormAct(c, 3, gn_groups=g, name="lvl3_conv2",
                         kernel_init=_NORMAL01)(t3)

        fused = t0 + t1 + t2 + t3
        if towers_only:
            return (fused,)

        loc = ConvNormAct(self.out_channels, 1, gn_groups=g, name="conv_pred",
                          kernel_init=_NORMAL01)(fused)
        outs = [loc]
        for i in range(self.num_aux_convs):
            outs.append(ConvNormAct(self.out_channels, 1, gn_groups=g,
                                    name=f"aux_conv{i}",
                                    kernel_init=_NORMAL01)(fused))
        return tuple(outs)
