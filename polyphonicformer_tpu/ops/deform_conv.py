"""Deformable convolution v1 (DeformConv2dPack equivalent) as gather+matmul.

reference: mmcv.ops.DeformConv2dPack (CUDA), used by UperNetAlignHead
(/root/reference/polyphonic/funcs/semantic_fpn.py:11,256).  TPU-native
formulation: the learned offset conv predicts a (dy, dx) per kernel tap per
output position; each tap bilinearly samples the input (zero padding) and
the K*K sampled maps contract with the weight on the MXU.
"""
from __future__ import annotations

import flax.linen as nn
import jax
import jax.numpy as jnp


def _bilinear_gather(feat: jax.Array, ys: jax.Array, xs: jax.Array) -> jax.Array:
    """feat: (H, W, C); ys/xs: (Ho, Wo) float sample coords; zero outside."""
    h, w, c = feat.shape
    y0 = jnp.floor(ys)
    x0 = jnp.floor(xs)
    ly = ys - y0
    lx = xs - x0

    def tap(yi, xi, wgt):
        inside = (yi >= 0) & (yi < h) & (xi >= 0) & (xi < w)
        yc = jnp.clip(yi, 0, h - 1).astype(jnp.int32)
        xc = jnp.clip(xi, 0, w - 1).astype(jnp.int32)
        vals = feat.reshape(h * w, c)[yc * w + xc]
        return vals * (wgt * inside.astype(feat.dtype))[..., None]

    return (tap(y0, x0, (1 - ly) * (1 - lx)) + tap(y0, x0 + 1, (1 - ly) * lx)
            + tap(y0 + 1, x0, ly * (1 - lx)) + tap(y0 + 1, x0 + 1, ly * lx))


class DeformConv2d(nn.Module):
    """3x3 deformable conv with learned offsets (offset conv zero-init, as
    in DeformConv2dPack)."""

    features: int
    kernel_size: int = 3

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        k = self.kernel_size
        pad = k // 2
        b, h, w, c = x.shape
        offsets = nn.Conv(2 * k * k, (k, k), padding="SAME",
                          kernel_init=nn.initializers.zeros,
                          bias_init=nn.initializers.zeros,
                          name="conv_offset")(x)
        weight = self.param("weight", nn.initializers.variance_scaling(
            2.0, "fan_out", "normal"), (k, k, c, self.features))

        ys_base = jnp.arange(h, dtype=x.dtype)[:, None] * jnp.ones((1, w), x.dtype)
        xs_base = jnp.ones((h, 1), x.dtype) * jnp.arange(w, dtype=x.dtype)[None]

        out = jnp.zeros((b, h, w, self.features), x.dtype)
        for kh in range(k):
            for kw in range(k):
                t = kh * k + kw
                dy = offsets[..., 2 * t]
                dx = offsets[..., 2 * t + 1]
                ys = ys_base[None] + (kh - pad) + dy
                xs = xs_base[None] + (kw - pad) + dx
                sampled = jax.vmap(_bilinear_gather)(x, ys, xs)  # (B, H, W, C)
                out = out + jnp.einsum("bhwc,co->bhwo", sampled,
                                       weight[kh, kw])
        return out
