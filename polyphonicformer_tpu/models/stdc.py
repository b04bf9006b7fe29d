"""STDC backbones (STDCNet813 / STDCNet1446), TPU-native.

reference: /root/reference/polyphonic/funcs/semantic_fpn.py:412-709
(ConvX = conv+BN+ReLU; Cat/Add bottlenecks with progressive channel halving;
stage layout x2/x4/x8/x16/x32 returning strides 4/8/16/32).  Registered in
the reference but not used by shipped configs — provided for capability
parity as lightweight alternatives to ResNet.
"""
from __future__ import annotations

import math
from typing import Sequence, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp

from .layers import FrozenBatchNorm


class ConvX(nn.Module):
    features: int
    kernel: int = 3
    strides: int = 1

    @nn.compact
    def __call__(self, x):
        p = self.kernel // 2
        x = nn.Conv(self.features, (self.kernel, self.kernel),
                    strides=(self.strides, self.strides), padding=[(p, p), (p, p)],
                    use_bias=False, name="conv")(x)
        x = FrozenBatchNorm(self.features, name="bn")(x)
        return nn.relu(x)


def _block_channels(out_planes: int, block_num: int) -> Sequence[int]:
    chans = []
    for idx in range(block_num):
        if idx == 0:
            chans.append(out_planes // 2)
        elif idx == 1 and block_num == 2:
            chans.append(out_planes // 2)
        elif idx == 1 and block_num > 2:
            chans.append(out_planes // 4)
        elif idx < block_num - 1:
            chans.append(out_planes // int(math.pow(2, idx + 1)))
        else:
            chans.append(out_planes // int(math.pow(2, idx)))
    return chans


class CatBottleneck(nn.Module):
    out_planes: int
    block_num: int = 4
    strides: int = 1

    @nn.compact
    def __call__(self, x):
        chans = _block_channels(self.out_planes, self.block_num)
        outs = []
        out1 = ConvX(chans[0], kernel=1, name="conv0")(x)
        out = out1
        for idx, ch in enumerate(chans[1:]):
            if idx == 0 and self.strides == 2:
                # depthwise stride-2 "avd" layer on the first branch
                dw = nn.Conv(out.shape[-1], (3, 3), strides=(2, 2),
                             padding=[(1, 1), (1, 1)], feature_group_count=out.shape[-1],
                             use_bias=False, name="avd_conv")(out)
                dw = FrozenBatchNorm(out.shape[-1], name="avd_bn")(dw)
                out = ConvX(ch, name=f"conv{idx + 1}")(dw)
            else:
                out = ConvX(ch, name=f"conv{idx + 1}")(out)
            outs.append(out)
        if self.strides == 2:
            out1 = nn.avg_pool(out1, (3, 3), strides=(2, 2),
                               padding=[(1, 1), (1, 1)])
        return jnp.concatenate([out1] + outs, axis=-1)


class AddBottleneck(nn.Module):
    out_planes: int
    block_num: int = 4
    strides: int = 1

    @nn.compact
    def __call__(self, x):
        chans = _block_channels(self.out_planes, self.block_num)
        outs = []
        out = x
        for idx, ch in enumerate(chans):
            out = ConvX(ch, kernel=1 if idx == 0 else 3, name=f"conv{idx}")(out)
            if idx == 0 and self.strides == 2:
                dw = nn.Conv(out.shape[-1], (3, 3), strides=(2, 2),
                             padding=[(1, 1), (1, 1)], feature_group_count=out.shape[-1],
                             use_bias=False, name="avd_conv")(out)
                out = FrozenBatchNorm(out.shape[-1], name="avd_bn")(dw)
            outs.append(out)
        skip = x
        if self.strides == 2:
            skip = nn.Conv(x.shape[-1], (3, 3), strides=(2, 2), padding=[(1, 1), (1, 1)],
                           feature_group_count=x.shape[-1], use_bias=False,
                           name="skip_dw")(x)
            skip = FrozenBatchNorm(x.shape[-1], name="skip_dw_bn")(skip)
            skip = nn.Conv(self.out_planes, (1, 1), use_bias=False,
                           name="skip_pw")(skip)
            skip = FrozenBatchNorm(self.out_planes, name="skip_pw_bn")(skip)
        return jnp.concatenate(outs, axis=-1) + skip


class STDCNet(nn.Module):
    """layers=(2,2,2) -> STDCNet813; layers=(4,5,3) -> STDCNet1446."""

    base: int = 64
    layers: Tuple[int, ...] = (2, 2, 2)
    block_num: int = 4
    block_type: str = "cat"  # 'cat' | 'add'

    @nn.compact
    def __call__(self, x) -> Tuple[jax.Array, ...]:
        block = CatBottleneck if self.block_type == "cat" else AddBottleneck
        feat2 = ConvX(self.base // 2, strides=2, name="stem0")(x)
        feat4 = ConvX(self.base, strides=2, name="stem1")(feat2)
        feats = []
        y = feat4
        for i, num in enumerate(self.layers):
            for j in range(num):
                out_planes = self.base * int(math.pow(2, i + 2))
                y = block(out_planes, self.block_num,
                          strides=2 if j == 0 else 1,
                          name=f"stage{i}_{j}")(y)
            feats.append(y)
        feat8, feat16, feat32 = feats
        return feat4, feat8, feat16, feat32


def stdcnet813(**kw) -> STDCNet:
    return STDCNet(layers=(2, 2, 2), **kw)


def stdcnet1446(**kw) -> STDCNet:
    return STDCNet(layers=(4, 5, 3), **kw)
