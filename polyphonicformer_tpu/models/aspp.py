"""ASPP auxiliary semantic neck (the reference's ``semantic_out_cfg`` head).

reference: /root/reference/polyphonic/kernel_head.py:203-211 builds an ASPP
neck via mmdet's registry (``build_neck(semantic_out_cfg)``) plus a 1x1
``semantic_aspp_predict`` conv to num_classes, applied to the fused
``x_feats`` (kernel_head.py:307-309).  The neck class itself is not part of
the reference repo (it comes from the external mmdet registry) and no
shipped config enables it, so this is the standard DeepLab-v3 ASPP shape:
parallel 1x1 + dilated 3x3 branches + global-average-pool image branch,
concatenated and projected back to ``out_channels``
(= ``out_feat_channels`` in the reference's attribute naming).

The output feeds exactly two places, mirroring the reference:
* training: ``loss_aspp_semseg`` — softmax CE with ignore_index=num_classes
  over the dense rpn seg target (kernel_head.py:561-566);
* inference: the reference interpolates/rescales the map and then never
  consumes it (kernel_update.py:309-311,425-426 — the rescaled tensor is
  dead code), so the TPU pipeline skips computing it outside training.
"""
from __future__ import annotations

from typing import Sequence

import flax.linen as nn
import jax
import jax.numpy as jnp

_NORMAL01 = nn.initializers.normal(stddev=0.01)


class ASPP(nn.Module):
    """DeepLab-v3 atrous spatial pyramid pooling over NHWC features."""

    out_channels: int = 256
    dilations: Sequence[int] = (1, 6, 12, 18)
    gn_groups: int = 32

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        c = self.out_channels
        branches = []
        for i, d in enumerate(self.dilations):
            k = 1 if d == 1 else 3
            p = 0 if d == 1 else d
            y = nn.Conv(c, (k, k), padding=[(p, p), (p, p)],
                        kernel_dilation=(d, d), use_bias=False,
                        kernel_init=_NORMAL01, name=f"branch{i}_conv")(x)
            y = nn.GroupNorm(num_groups=self.gn_groups, epsilon=1e-5,
                             name=f"branch{i}_gn")(y)
            branches.append(nn.relu(y))
        # image-level branch: global average pool -> 1x1 -> broadcast back
        g = x.mean(axis=(1, 2), keepdims=True)
        g = nn.Conv(c, (1, 1), use_bias=False, kernel_init=_NORMAL01,
                    name="image_pool_conv")(g)
        g = nn.GroupNorm(num_groups=self.gn_groups, epsilon=1e-5,
                         name="image_pool_gn")(g)
        g = nn.relu(g)
        branches.append(jnp.broadcast_to(g, x.shape[:3] + (c,)))
        y = jnp.concatenate(branches, axis=-1)
        y = nn.Conv(c, (1, 1), use_bias=False, kernel_init=_NORMAL01,
                    name="project_conv")(y)
        y = nn.GroupNorm(num_groups=self.gn_groups, epsilon=1e-5,
                         name="project_gn")(y)
        return nn.relu(y)
