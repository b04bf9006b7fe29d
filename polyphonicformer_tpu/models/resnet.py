"""ResNet-50 backbone (torchvision/mmdet 'pytorch' style), NHWC, frozen BN.

reference: /root/reference/mmdet/models/backbones/resnet.py:306-672 with
frozen_stages=1, norm_eval=True (configs/_base_/models/polyphonic_former.py:12-21).
'pytorch' style = stride on the 3x3 conv of each bottleneck.

Freezing of stem + stage1 parameters is handled by the optimizer mask
(train/optim.py), not inside the module; BN is always FrozenBatchNorm.
"""
from __future__ import annotations

from typing import Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp

from .layers import FrozenBatchNorm

_STAGE_BLOCKS = {
    "resnet50": (3, 4, 6, 3),
    "resnet101": (3, 4, 23, 3),
}


class Bottleneck(nn.Module):
    planes: int  # width of the 3x3 conv
    strides: int = 1
    has_downsample: bool = False

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        out_ch = self.planes * 4
        identity = x
        y = nn.Conv(self.planes, (1, 1), use_bias=False, name="conv1")(x)
        y = FrozenBatchNorm(self.planes, name="bn1")(y)
        y = nn.relu(y)
        # explicit (1,1) padding == torch pad=1; "SAME" would pad (0,1) for
        # stride 2 and shift the windows off the checkpoint's convention
        y = nn.Conv(self.planes, (3, 3), strides=(self.strides, self.strides),
                    padding=[(1, 1), (1, 1)], use_bias=False, name="conv2")(y)
        y = FrozenBatchNorm(self.planes, name="bn2")(y)
        y = nn.relu(y)
        y = nn.Conv(out_ch, (1, 1), use_bias=False, name="conv3")(y)
        y = FrozenBatchNorm(out_ch, name="bn3")(y)
        if self.has_downsample:
            identity = nn.Conv(out_ch, (1, 1),
                               strides=(self.strides, self.strides),
                               use_bias=False, name="downsample_conv")(x)
            identity = FrozenBatchNorm(out_ch, name="downsample_bn")(identity)
        return nn.relu(y + identity)


class _StemConv(nn.Module):
    """7x7/s2 stem conv with a TPU lane-padding fix.

    XLA's conv at C_in=3 runs ~20x off roofline on TPU (3 of 128 lanes
    used); zero-padding the input and kernel to 8 channels selects a ~2x
    faster conv path with mathematically identical output (measured
    3.48 -> 1.87 ms at 1024x2048 bf16, tools_dev/bench_stem3.py).  Applied
    only on the bf16 compute path so the f32 reference-exact path keeps
    XLA's original op selection bit-for-bit.

    Param layout matches nn.Conv (kernel (7,7,3,64) under this module's
    scope) so the torch-checkpoint converter is unaffected.
    """

    features: int = 64

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        w = self.param("kernel", nn.initializers.lecun_normal(),
                       (7, 7, 3, self.features))
        dt = jnp.promote_types(x.dtype, w.dtype)
        x = x.astype(dt)
        w = w.astype(dt)
        if dt == jnp.bfloat16:
            x = jnp.pad(x, ((0, 0), (0, 0), (0, 0), (0, 5)))
            w = jnp.pad(w, ((0, 0), (0, 0), (0, 5), (0, 0)))
        return jax.lax.conv_general_dilated(
            x, w, (2, 2), [(3, 3), (3, 3)],
            dimension_numbers=("NHWC", "HWIO", "NHWC"))


class ResNet(nn.Module):
    depth: str = "resnet50"

    @nn.compact
    def __call__(self, x: jax.Array,
                 num_stages: int = 4) -> Tuple[jax.Array, ...]:
        """x: (B, H, W, 3) normalized. Returns C2..C5 (strides 4/8/16/32).

        ``num_stages`` (static; 0 = stem only) truncates the stack — used by
        the perf-breakdown tooling to attribute time per stage.
        """
        blocks = _STAGE_BLOCKS[self.depth]
        # stem: 7x7/2 + maxpool 3x3/2
        y = _StemConv(name="conv1")(x)
        y = FrozenBatchNorm(64, name="bn1")(y)
        y = nn.relu(y)
        y = nn.max_pool(y, (3, 3), strides=(2, 2), padding=[(1, 1), (1, 1)])
        if num_stages == 0:
            return (y,)

        outs = []
        planes = 64
        for stage_idx, num_blocks in enumerate(blocks[:num_stages]):
            stride = 1 if stage_idx == 0 else 2
            for block_idx in range(num_blocks):
                y = Bottleneck(
                    planes=planes,
                    strides=stride if block_idx == 0 else 1,
                    has_downsample=(block_idx == 0),
                    name=f"layer{stage_idx + 1}_{block_idx}",
                )(y)
            outs.append(y)
            planes *= 2
        return tuple(outs)
