"""Quasi-dense track-embedding head.

reference: /root/reference/polyphonic/video/track_heads.py:13-102
(4x conv3x3+GN, 1x fc1024, fc_embed 256) fed by RoIAlign boxes derived from
masks (polyphonic_former_video.py:408-419).
"""
from __future__ import annotations

import flax.linen as nn
import jax
import jax.numpy as jnp

from ..configs import TrackHeadConfig
from ..ops.roi_align import (masks_to_boxes_mad, multilevel_roi_align,
                             multilevel_roi_align_separable)
from .layers import ConvNormAct

_XAVIER = nn.initializers.xavier_uniform()


class TrackEmbedMLP(nn.Module):
    """conv/fc tower mapping (M, 7, 7, C) roi feats -> (M, E) embeddings."""

    cfg: TrackHeadConfig

    @nn.compact
    def __call__(self, roi_feats: jax.Array) -> jax.Array:
        cfg = self.cfg
        x = roi_feats
        for i in range(cfg.num_convs):
            x = ConvNormAct(cfg.conv_out_channels, 3, gn_groups=cfg.gn_groups,
                            name=f"conv{i}")(x)
        x = x.reshape(x.shape[0], -1)
        for i in range(cfg.num_fcs):
            x = nn.relu(nn.Dense(cfg.fc_out_channels, name=f"fc{i}",
                                 kernel_init=_XAVIER)(x))
        return nn.Dense(cfg.embed_channels, name="fc_embed",
                        kernel_init=nn.initializers.normal(0.01))(x)


class TrackHead(nn.Module):
    cfg: TrackHeadConfig

    @nn.compact
    def __call__(self, fpn_feats, masks: jax.Array, mask_valid: jax.Array,
                 boxes: jax.Array | None = None) -> jax.Array:
        """fpn_feats: P2..P5 (B, H_l, W_l, C); masks: (B, M, H, W) binary at
        input resolution (may be a dummy when ``boxes`` is given);
        mask_valid: (B, M); boxes: optional precomputed (B, M, 4) MAD boxes.
        Returns (B, M, E)."""
        cfg = self.cfg

        roi_align_fn = (multilevel_roi_align_separable
                        if cfg.roi_impl == "separable"
                        else multilevel_roi_align)

        def per_image(feats, m, valid, bxs):
            if bxs is None:
                bxs = masks_to_boxes_mad(m)
            bxs = jnp.where(valid[:, None], bxs, 0.0)
            rois = roi_align_fn(
                feats, bxs, strides=cfg.featmap_strides,
                out_size=cfg.roi_feat_size, sampling_ratio=cfg.roi_sampling_ratio,
                finest_scale=cfg.finest_scale)
            return rois

        if boxes is None:
            rois = jax.vmap(lambda f, m, v: per_image(f, m, v, None))(
                fpn_feats, masks, mask_valid)
        else:
            rois = jax.vmap(per_image)(fpn_feats, masks, mask_valid, boxes)
        b, m = rois.shape[:2]
        rois = rois.reshape(b * m, *rois.shape[2:])
        embeds = TrackEmbedMLP(cfg, name="embed_mlp")(rois)
        embeds = embeds.reshape(b, m, -1)
        return embeds * mask_valid[..., None].astype(embeds.dtype)
