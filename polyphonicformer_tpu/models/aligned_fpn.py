"""Flow-aligned localization neck: UperNetAlignHead + AlignedModule(v2).

reference: /root/reference/polyphonic/funcs/semantic_fpn.py:238-409 —
top-down FPN where upsampling is replaced by learned flow-field warping
(AlignedModule) or gated dual warping (AlignedModulev2PoolingAtten), fused
at stride 8 and finished with a deformable conv.  Registered in the
reference but not used by shipped configs; provided for capability parity.
"""
from __future__ import annotations

from typing import Sequence

import flax.linen as nn
import jax
import jax.numpy as jnp

from ..ops.deform_conv import DeformConv2d
from ..ops.grid_sample import flow_warp
from .layers import FrozenBatchNorm, sine_positional_encoding

_NOBIAS = dict(use_bias=False)


class AlignedModule(nn.Module):
    outplane: int

    @nn.compact
    def __call__(self, low_feature: jax.Array, h_feature: jax.Array) -> jax.Array:
        """low_feature: (B, 2H, 2W, C) fine level; h_feature: (B, H, W, C)
        coarse level. Returns warped h_feature at the fine resolution."""
        size = low_feature.shape[1:3]
        h_orig = h_feature
        low = nn.Conv(self.outplane, (1, 1), name="down_l", **_NOBIAS)(low_feature)
        hi = nn.Conv(self.outplane, (1, 1), name="down_h", **_NOBIAS)(h_feature)
        from ..ops.resize import resize_bilinear_nhwc

        hi = resize_bilinear_nhwc(hi, size)
        flow = nn.Conv(2, (3, 3), padding="SAME", name="flow_make",
                       **_NOBIAS)(jnp.concatenate([hi, low], axis=-1))
        return flow_warp(h_orig, flow, size)


class AlignedModuleV2PoolingAtten(nn.Module):
    outplane: int

    @nn.compact
    def __call__(self, low_feature: jax.Array, h_feature: jax.Array) -> jax.Array:
        size = low_feature.shape[1:3]
        h_orig = h_feature
        low = nn.Conv(self.outplane, (1, 1), name="down_l", **_NOBIAS)(low_feature)
        hi = nn.Conv(self.outplane, (1, 1), name="down_h", **_NOBIAS)(h_feature)
        from ..ops.resize import resize_bilinear_nhwc

        hi = resize_bilinear_nhwc(hi, size)
        flow = nn.Conv(4, (3, 3), padding="SAME", name="flow_make",
                       **_NOBIAS)(jnp.concatenate([hi, low], axis=-1))
        flow_up, flow_down = flow[..., :2], flow[..., 2:]
        h_warp = flow_warp(h_orig, flow_up, size)
        l_warp = flow_warp(low_feature, flow_down, size)
        stats = jnp.concatenate([
            hi.mean(axis=-1, keepdims=True),
            low_feature.mean(axis=-1, keepdims=True),
            hi.max(axis=-1, keepdims=True),
            low_feature.max(axis=-1, keepdims=True),
        ], axis=-1)
        gate = jax.nn.sigmoid(nn.Conv(1, (3, 3), padding="SAME",
                                      name="flow_gate", **_NOBIAS)(stats))
        return h_warp * gate + l_warp * (1.0 - gate)


class UperNetAlignHead(nn.Module):
    """Alternative localization neck producing one stride-8 fused map."""

    out_channels: int = 256
    align_type: str = "v1"  # 'v1' | 'v2'
    pe_num_feats: int = 0

    @nn.compact
    def __call__(self, conv_out: Sequence[jax.Array]) -> jax.Array:
        n = len(conv_out)
        # NOTE: the reference feeds the raw top level (2048 ch) into the
        # aligned add (semantic_fpn.py:290-295), which cannot type-check —
        # the module is registered but dead code there.  We project the top
        # level to out_channels first, the evident intent.
        f = nn.Conv(self.out_channels, (1, 1), name="fpn_in_top")(conv_out[-1])
        f = nn.relu(FrozenBatchNorm(self.out_channels, name="fpn_in_top_bn")(f))
        feats = [f]
        for i in reversed(range(n - 1)):
            cx = nn.Conv(self.out_channels, (1, 1), name=f"fpn_in_{i}")(conv_out[i])
            cx = FrozenBatchNorm(self.out_channels, name=f"fpn_in_bn_{i}")(cx)
            cx = nn.relu(cx)
            align_cls = (AlignedModule if self.align_type == "v1"
                         else AlignedModuleV2PoolingAtten)
            warped = align_cls(self.out_channels // 2,
                               name=f"align_{i}")(cx, f)
            f = cx + warped
            y = nn.Conv(self.out_channels, (3, 3), padding="SAME",
                        name=f"fpn_out_{i}")(f)
            y = FrozenBatchNorm(self.out_channels, name=f"fpn_out_bn_{i}")(y)
            feats.append(nn.relu(y))

        from ..ops.resize import resize_bilinear_nhwc

        size = conv_out[1].shape[1:3]
        fused = sum(resize_bilinear_nhwc(t, size) for t in feats)
        pe = sine_positional_encoding(size[0], size[1],
                                      num_feats=self.pe_num_feats
                                      or self.out_channels // 2,
                                      dtype=fused.dtype)
        fused = fused + pe[None]
        return DeformConv2d(self.out_channels, name="dcn")(fused)
