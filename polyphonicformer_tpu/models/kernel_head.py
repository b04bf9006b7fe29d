"""KernelHead: stage-0 proposal generator (thing/stuff/depth branches).

reference: /root/reference/polyphonic/kernel_head.py:240-347 with the shipped
config (num_proposals=100, 1x1 convs, GN(32), feat_refine=False, use_binary,
proposal_feats_with_obj, cat_stuff_mask).

The learned query kernels and the stuff/depth 1x1 conv weights double as
query initializations, so those convs are expressed as explicit Dense-style
parameters over the channel axis.
"""
from __future__ import annotations

from typing import NamedTuple, Sequence

import flax.linen as nn
import jax
import jax.numpy as jnp

from .kernel_update_head import bias_init_with_prob
from .layers import ConvNormAct
from .semantic_fpn import SemanticFPNWrapper

_NORMAL01 = nn.initializers.normal(stddev=0.01)


class RPNOutput(NamedTuple):
    proposal_feats: jax.Array  # (B, 111, C) kernels incl. stuff
    x_feats: jax.Array  # (B, h, w, C) fused loc+sem features (stride 8)
    mask_preds: jax.Array  # (B, 111, h, w) logits incl. stuff rows
    mask_preds_things: jax.Array  # (B, 100, h, w) proposal logits only
    seg_preds: jax.Array  # (B, h, w, num_classes) dense semantic logits
    depth_feats: jax.Array  # (B, h, w, C) depth branch features
    depth_proposal: jax.Array  # (B, 111, C) depth kernels
    depth_pred: jax.Array  # (B, h, w) dense depth logits
    # auxiliary ASPP semantic logits (semantic_out_cfg head,
    # kernel_head.py:307-309); None unless with_semantic_aspp is enabled
    aspp_seg_preds: jax.Array | None = None


class KernelHead(nn.Module):
    num_proposals: int = 100
    num_thing_classes: int = 8
    num_stuff_classes: int = 11
    channels: int = 256
    gn_groups: int = 32
    kernel_init_std: float = 1.0
    hard_mask_thr: float = 0.5
    # semantic_out_cfg ASPP auxiliary head (kernel_head.py:203-211); off in
    # every shipped reference config
    with_semantic_aspp: bool = False
    aspp_dilations: Sequence[int] = (1, 6, 12, 18)

    @property
    def num_classes(self) -> int:
        return self.num_thing_classes + self.num_stuff_classes

    @nn.compact
    def __call__(self, fpn_feats: Sequence[jax.Array]) -> RPNOutput:
        c = self.channels
        b = fpn_feats[0].shape[0]

        loc, sem, dep = SemanticFPNWrapper(
            feat_channels=c, out_channels=c, gn_groups=self.gn_groups,
            name="localization_fpn")(fpn_feats)

        loc_feats = ConvNormAct(c, 1, gn_groups=self.gn_groups, name="loc_conv0",
                                kernel_init=_NORMAL01)(loc)
        semantic_feats = ConvNormAct(c, 1, gn_groups=self.gn_groups,
                                     name="seg_conv0", kernel_init=_NORMAL01)(sem)
        depth_feats = ConvNormAct(c, 1, gn_groups=self.gn_groups,
                                  name="depth_conv0", kernel_init=_NORMAL01)(dep)

        # learned query kernels: a bias-free 1x1 conv whose weight IS the
        # query init (kernel_head.py:144-149, init std 1.0)
        init_kernels = self.param(
            "init_kernels", nn.initializers.normal(stddev=self.kernel_init_std),
            (self.num_proposals, c))
        mask_preds_things = jnp.einsum("bhwc,nc->bnhw", loc_feats, init_kernels)

        # dense stuff/semantic segmentation 1x1 conv (weights reused as stuff
        # query kernels, kernel_head.py:153-155, 329-336)
        conv_seg_w = self.param("conv_seg_weight", _NORMAL01,
                                (self.num_classes, c))
        conv_seg_b = self.param(
            "conv_seg_bias", nn.initializers.constant(bias_init_with_prob(0.01)),
            (self.num_classes,))
        seg_preds = jnp.einsum("bhwc,nc->bhwn", semantic_feats, conv_seg_w) + conv_seg_b

        # dense depth 1x1 conv; its weight is the per-query depth proposal
        # (kernel_head.py:200, 284-292)
        conv_depth_w = self.param("conv_direct_depth_weight",
                                  nn.initializers.variance_scaling(
                                      1.0 / 3.0, "fan_in", "uniform"), (1, c))
        conv_depth_b = self.param("conv_direct_depth_bias",
                                  nn.initializers.zeros, (1,))
        depth_pred = jnp.einsum("bhwc,nc->bhwn", depth_feats, conv_depth_w) + conv_depth_b
        depth_pred = depth_pred[..., 0]  # (B, h, w)

        x_feats = semantic_feats + loc_feats

        # auxiliary ASPP semantic prediction on the fused features
        # (kernel_head.py:307-309); training-only consumer (the reference
        # computes it at inference too but never uses the result —
        # kernel_update.py:425-426)
        aspp_seg_preds = None
        if self.with_semantic_aspp:
            from .aspp import ASPP

            aspp_feats = ASPP(out_channels=c, dilations=self.aspp_dilations,
                              gn_groups=self.gn_groups,
                              name="semantic_aspp")(x_feats)
            aspp_w = self.param("semantic_aspp_predict_weight", _NORMAL01,
                                (self.num_classes, c))
            aspp_b = self.param("semantic_aspp_predict_bias",
                                nn.initializers.zeros, (self.num_classes,))
            aspp_seg_preds = jnp.einsum("bhwc,nc->bhwn", aspp_feats,
                                        aspp_w) + aspp_b

        # query init: kernel weights + binary-mask-pooled image features
        # (fused Pallas threshold+matmul kernel)
        from ..ops.pallas.mask_pool import masked_pool

        obj_feats = masked_pool(mask_preds_things, x_feats,
                                self.hard_mask_thr).astype(x_feats.dtype)
        proposal_feats = init_kernels[None] + obj_feats  # (B, 100, C)

        # concatenate the stuff kernels -> 111 queries
        stuff_slice = slice(self.num_thing_classes, self.num_classes)
        stuff_seg = seg_preds[..., stuff_slice]  # (B, h, w, 11)
        mask_preds = jnp.concatenate(
            [mask_preds_things, jnp.moveaxis(stuff_seg, -1, 1)], axis=1)
        stuff_kernels = jnp.broadcast_to(
            conv_seg_w[stuff_slice][None], (b, self.num_stuff_classes, c))
        proposal_feats = jnp.concatenate([proposal_feats, stuff_kernels], axis=1)
        num_queries = self.num_proposals + self.num_stuff_classes
        depth_proposal = jnp.broadcast_to(conv_depth_w[None] * jnp.ones((1, 1, 1)),
                                          (b, 1, c))
        depth_proposal = jnp.broadcast_to(depth_proposal, (b, num_queries, c))

        return RPNOutput(
            proposal_feats=proposal_feats,
            x_feats=x_feats,
            mask_preds=mask_preds,
            mask_preds_things=mask_preds_things,
            seg_preds=seg_preds,
            depth_feats=depth_feats,
            depth_proposal=depth_proposal,
            depth_pred=depth_pred,
            aspp_seg_preds=aspp_seg_preds,
        )
