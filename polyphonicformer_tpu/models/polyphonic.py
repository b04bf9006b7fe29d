"""PolyphonicFormer: full model forward (backbone -> FPN -> KernelHead ->
3x KernelUpdateHead).

reference top-level flow: /root/reference/polyphonic/polyphonic_former.py and
/root/reference/polyphonic/kernel_update.py.  One forward returns the RPN
(stage-0) outputs plus every refinement stage's outputs; training losses and
inference post-processing are pure functions on top (train/losses.py,
infer/panoptic.py), keeping the module itself side-effect free and trivially
jittable.
"""
from __future__ import annotations

from typing import NamedTuple, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp

from ..configs import ModelConfig
from .fpn import FPN
from .kernel_head import KernelHead, RPNOutput
from .kernel_update_head import KernelUpdateHead, StageOutput
from .resnet import ResNet
from .track_head import TrackHead


class ModelOutput(NamedTuple):
    rpn: RPNOutput
    stages: Tuple[StageOutput, ...]


class PolyphonicFormer(nn.Module):
    cfg: ModelConfig

    def setup(self):
        cfg = self.cfg
        if cfg.backbone.startswith("resnet"):
            bb_cls = ResNet
            if cfg.remat_backbone:
                # remat the whole backbone: full-res activations dominate
                # training HBM (jax.checkpoint trades FLOPs for memory)
                bb_cls = nn.remat(ResNet)
            self.backbone = bb_cls(cfg.backbone, name="backbone")
        elif cfg.backbone.startswith("swin"):
            from .swin import SwinTransformer

            spec = {"swin_tiny": (96, (2, 2, 6, 2), (3, 6, 12, 24)),
                    "swin_large": (192, (2, 2, 18, 2), (6, 12, 24, 48))}
            dim, depths, heads = spec[cfg.backbone]
            bb_cls = nn.remat(SwinTransformer) if cfg.remat_backbone else SwinTransformer
            self.backbone = bb_cls(dim, depths, heads,
                                   partition=cfg.shard_backbone,
                                   name="backbone")
        elif cfg.backbone.startswith("stdc"):
            from .stdc import STDCNet

            layers = (2, 2, 2) if cfg.backbone == "stdc813" else (4, 5, 3)
            self.backbone = STDCNet(layers=layers, name="backbone")
        else:
            raise ValueError(f"unknown backbone {cfg.backbone}")
        self.neck = FPN(cfg.fpn_out_channels, name="neck")
        self.rpn_head = KernelHead(
            num_proposals=cfg.num_proposals,
            num_thing_classes=cfg.num_thing_classes,
            num_stuff_classes=cfg.num_stuff_classes,
            channels=cfg.out_channels,
            with_semantic_aspp=cfg.with_semantic_aspp,
            aspp_dilations=cfg.aspp_dilations,
            name="rpn_head",
        )
        self.mask_heads = [
            KernelUpdateHead(
                num_classes=cfg.num_classes,
                channels=cfg.out_channels,
                num_heads=cfg.num_heads,
                feedforward_channels=cfg.feedforward_channels,
                hard_mask_thr=cfg.hard_mask_thr,
                name=f"mask_head_{i}",
            )
            for i in range(cfg.num_stages)
        ]
        if cfg.with_track:
            self.track_head = TrackHead(cfg.track_head, name="track_head")

    def extract_feat(self, img: jax.Array) -> Tuple[jax.Array, ...]:
        """img: (B, H, W, 3) normalized. Returns FPN P2..P5 (NHWC)."""
        feats = self.backbone(img)
        return self.neck(feats)

    def forward_heads(self, fpn_feats) -> ModelOutput:
        rpn = self.rpn_head(fpn_feats)
        proposal_feats = rpn.proposal_feats
        mask_preds = rpn.mask_preds
        depth_proposal = rpn.depth_proposal
        stages = []
        for head in self.mask_heads:
            out = head(rpn.x_feats, proposal_feats, mask_preds,
                       depth_proposal, rpn.depth_feats)
            stages.append(out)
            proposal_feats = out.obj_feats
            mask_preds = out.mask_preds
            depth_proposal = out.depth_kernels
        return ModelOutput(rpn=rpn, stages=tuple(stages))

    def __call__(self, img: jax.Array) -> ModelOutput:
        fpn_feats = self.extract_feat(img)
        return self.forward_heads(fpn_feats)

    def init_all(self, img: jax.Array) -> ModelOutput:
        """Initialization entry point touching every submodule (including the
        track head, which __call__ does not exercise)."""
        fpn_feats = self.extract_feat(img)
        out = self.forward_heads(fpn_feats)
        if self.cfg.with_track:
            b, h, w, _ = img.shape
            masks = jnp.zeros((b, 1, h, w), img.dtype)
            valid = jnp.zeros((b, 1), bool)
            self.track_head(fpn_feats, masks, valid)
        return out

    def forward_track_embeds(self, fpn_feats, masks: jax.Array,
                             mask_valid: jax.Array,
                             boxes: jax.Array | None = None) -> jax.Array:
        """RoI-align track embeddings for (padded) instance masks.

        masks: (B, M, H, W) binary masks at input resolution.
        mask_valid: (B, M) validity.
        boxes: optional precomputed (B, M, 4) RoI boxes (skips the
          mask->box reduction).
        Returns (B, M, embed_channels).
        """
        return self.track_head(fpn_feats, masks, mask_valid, boxes)
