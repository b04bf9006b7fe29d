"""One kernel-update refinement stage (the heart of PolyphonicFormer):
dual mask/depth kernel update + query attention + dynamic convolution.

reference: /root/reference/polyphonic/kernel_update_head.py:212-353 with the
shipped config (conv_kernel_size=1, feat_transform 1x1 Conv2d, with_ffn,
num_cls_fcs=1, num_mask_fcs=1, depth towers without activation).

TPU-native notes:
* the per-image ``F.conv2d`` loop over the batch
  (kernel_update_head.py:315-334) becomes one batched einsum
  ('bnc,bhwc->bnhw') that XLA maps onto the MXU;
* hard-mask pooling is an einsum over (N, HW) x (HW, C);
* queries are statically 111 (100 proposals + 11 stuff kernels) in every
  refinement stage for both train and test.
"""
from __future__ import annotations

from typing import NamedTuple

import flax.linen as nn
import jax
import jax.numpy as jnp

from .kernel_updator import KernelUpdator
from .layers import FFN, MultiheadSelfAttention

_XAVIER = nn.initializers.xavier_uniform()


def bias_init_with_prob(prob: float) -> float:
    import math

    return float(-math.log((1 - prob) / prob))


class StageOutput(NamedTuple):
    cls_score: jax.Array  # (B, N, num_classes) logits
    mask_preds: jax.Array  # (B, N, h, w) logits at stride 8
    obj_feats: jax.Array  # (B, N, C) updated mask kernels
    depth_preds: jax.Array  # (B, N, h, w) raw depth logits at stride 8
    depth_kernels: jax.Array  # (B, N, C) updated depth kernels


class KernelUpdateHead(nn.Module):
    num_classes: int = 19
    channels: int = 256
    num_heads: int = 8
    feedforward_channels: int = 2048
    hard_mask_thr: float = 0.5
    num_cls_fcs: int = 1
    num_mask_fcs: int = 1
    with_ffn: bool = True

    @nn.compact
    def __call__(self, x: jax.Array, proposal_feat: jax.Array,
                 mask_preds: jax.Array, depth_proposal: jax.Array,
                 depth_feats: jax.Array) -> StageOutput:
        """Args:
          x: (B, h, w, C) fused features (stride 8).
          proposal_feat: (B, N, C) mask kernels.
          mask_preds: (B, N, h, w) current mask logits (same resolution as x).
          depth_proposal: (B, N, C) depth kernels.
          depth_feats: (B, h, w, C) depth branch features.
        """
        c = self.channels
        b, n = proposal_feat.shape[:2]

        # feat_transform (1x1 conv, bias, no norm/act)
        x = nn.Conv(c, (1, 1), name="feat_transform")(x)
        depth_feats = nn.Conv(c, (1, 1), name="feat_depth_transform")(depth_feats)

        # hard-mask pooling (fused Pallas kernel: threshold + matmul in VMEM)
        from ..ops.pallas.mask_pool import masked_pool

        x_feat = masked_pool(mask_preds, x, self.hard_mask_thr).astype(x.dtype)
        depth_feat_masked = masked_pool(mask_preds, depth_feats,
                                        self.hard_mask_thr).astype(x.dtype)

        # unified-query coupling: depth kernel sees the (detached) mask kernel
        depth_proposal = depth_proposal + jax.lax.stop_gradient(proposal_feat)

        obj_feat = KernelUpdator(c, name="kernel_update_conv")(x_feat, proposal_feat)
        depth_feat_new = KernelUpdator(c, name="kernel_update_conv_depth")(
            depth_feat_masked, depth_proposal)

        obj_feat = MultiheadSelfAttention(c, self.num_heads, name="attention")(obj_feat)
        obj_feat = nn.LayerNorm(epsilon=1e-5, name="attention_norm")(obj_feat)
        depth_feat_new = MultiheadSelfAttention(c, self.num_heads,
                                                name="attention_depth")(depth_feat_new)
        depth_feat_new = nn.LayerNorm(epsilon=1e-5, name="attention_norm_depth")(depth_feat_new)

        if self.with_ffn:
            obj_feat = nn.LayerNorm(epsilon=1e-5, name="ffn_norm")(
                FFN(c, self.feedforward_channels, name="ffn")(obj_feat))
            depth_feat_new = nn.LayerNorm(epsilon=1e-5, name="ffn_norm_depth")(
                FFN(c, self.feedforward_channels, name="ffn_depth")(depth_feat_new))

        cls_feat = obj_feat
        mask_feat = obj_feat
        depth_reg_feat = depth_feat_new

        for i in range(self.num_cls_fcs):
            cls_feat = nn.Dense(c, use_bias=False, name=f"cls_fc{i}",
                                kernel_init=_XAVIER)(cls_feat)
            cls_feat = nn.LayerNorm(epsilon=1e-5, name=f"cls_ln{i}")(cls_feat)
            cls_feat = nn.relu(cls_feat)
        for i in range(self.num_mask_fcs):
            mask_feat = nn.Dense(c, use_bias=False, name=f"mask_fc{i}",
                                 kernel_init=_XAVIER)(mask_feat)
            mask_feat = nn.LayerNorm(epsilon=1e-5, name=f"mask_ln{i}")(mask_feat)
            mask_feat = nn.relu(mask_feat)
        for i in range(self.num_mask_fcs):
            # depth regs: Linear + LN, NO activation
            # (kernel_update_head.py:182-188)
            depth_reg_feat = nn.Dense(c, use_bias=False, name=f"depth_fc{i}",
                                      kernel_init=_XAVIER)(depth_reg_feat)
            depth_reg_feat = nn.LayerNorm(epsilon=1e-5, name=f"depth_ln{i}")(depth_reg_feat)

        cls_score = nn.Dense(
            self.num_classes, name="fc_cls", kernel_init=_XAVIER,
            bias_init=nn.initializers.constant(bias_init_with_prob(0.01)),
        )(cls_feat)
        mask_kernels = nn.Dense(c, name="fc_mask", kernel_init=_XAVIER)(mask_feat)
        depth_kernels_out = nn.Dense(c, name="fc_depth", kernel_init=_XAVIER)(depth_reg_feat)

        # dynamic 1x1 convolution, batched (replaces the per-image conv loop)
        new_mask_preds = jnp.einsum("bnc,bhwc->bnhw", mask_kernels, x)
        new_depth_preds = jnp.einsum("bnc,bhwc->bnhw", depth_kernels_out, depth_feats)

        return StageOutput(
            cls_score=cls_score,
            mask_preds=new_mask_preds,
            obj_feats=obj_feat,
            depth_preds=new_depth_preds,
            depth_kernels=depth_feat_new,
        )
