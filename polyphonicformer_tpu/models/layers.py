"""Common flax building blocks (NHWC layout throughout).

These replace the mmcv bricks used by the reference (ConvModule, FrozenBN,
MultiheadAttention with identity residual, FFN) with TPU-idiomatic flax
modules.  Parameter layout is kept 1:1 mappable onto the torch state_dict for
the checkpoint converter.
"""
from __future__ import annotations

from typing import Callable, Optional

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np


class FrozenBatchNorm(nn.Module):
    """BatchNorm in permanent eval mode (reference backbone uses
    norm_eval=True: running stats are constants, affine params trainable).

    Running stats live in the 'batch_stats' collection and are never updated.
    """

    features: int
    eps: float = 1e-5

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        scale = self.param("scale", nn.initializers.ones, (self.features,))
        bias = self.param("bias", nn.initializers.zeros, (self.features,))
        mean = self.variable("batch_stats", "mean",
                             lambda: jnp.zeros((self.features,), jnp.float32)).value
        var = self.variable("batch_stats", "var",
                            lambda: jnp.ones((self.features,), jnp.float32)).value
        inv = jax.lax.rsqrt(var + self.eps) * scale
        return (x - mean) * inv + bias


class ConvNormAct(nn.Module):
    """Conv2d -> optional GroupNorm -> optional ReLU (mmcv ConvModule
    default order conv/norm/act)."""

    features: int
    kernel_size: int = 3
    strides: int = 1
    gn_groups: int = 0  # 0 = no norm
    act: bool = True
    use_bias: Optional[bool] = None
    kernel_init: Callable = nn.initializers.variance_scaling(2.0, "fan_out", "normal")

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        use_bias = self.use_bias if self.use_bias is not None else self.gn_groups == 0
        # torch semantics: symmetric padding k//2 on both sides.  NOT "SAME" —
        # for stride 2 on even sizes SAME pads (0, 1), shifting every window
        # by one pixel relative to torch's pad=1 (checkpoint-parity breaker).
        p = self.kernel_size // 2
        x = nn.Conv(self.features, (self.kernel_size, self.kernel_size),
                    strides=(self.strides, self.strides), padding=[(p, p), (p, p)],
                    use_bias=use_bias, kernel_init=self.kernel_init,
                    name="conv")(x)
        if self.gn_groups > 0:
            x = nn.GroupNorm(num_groups=self.gn_groups, epsilon=1e-5, name="gn")(x)
        if self.act:
            x = nn.relu(x)
        return x


class MultiheadSelfAttention(nn.Module):
    """Self-attention with identity residual, matching mmcv's
    MultiheadAttention wrapper over torch.nn.MultiheadAttention
    (out = x + attn(x, x, x); dropout = 0 in shipped configs).

    Parameters use a packed qkv projection like torch (in_proj) so the
    checkpoint converter is a direct copy.
    """

    embed_dim: int
    num_heads: int

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        # x: (B, N, C)
        c = self.embed_dim
        in_proj_w = self.param("in_proj_weight", nn.initializers.xavier_uniform(),
                               (3 * c, c))
        in_proj_b = self.param("in_proj_bias", nn.initializers.zeros, (3 * c,))
        out_w = self.param("out_proj_weight", nn.initializers.xavier_uniform(),
                           (c, c))
        out_b = self.param("out_proj_bias", nn.initializers.zeros, (c,))
        qkv = jnp.einsum("bnc,dc->bnd", x, in_proj_w) + in_proj_b
        q, k, v = jnp.split(qkv, 3, axis=-1)
        b, n, _ = x.shape
        h = self.num_heads
        hd = c // h
        q = q.reshape(b, n, h, hd).transpose(0, 2, 1, 3)
        k = k.reshape(b, n, h, hd).transpose(0, 2, 1, 3)
        v = v.reshape(b, n, h, hd).transpose(0, 2, 1, 3)
        # scale q BEFORE the matmul (torch F.multi_head_attention_forward
        # order; keeps fp32 rounding identical for checkpoint parity)
        q = q / np.sqrt(hd).astype(np.float32)
        attn = jnp.einsum("bhqd,bhkd->bhqk", q, k)
        attn = jax.nn.softmax(attn.astype(jnp.float32), axis=-1).astype(x.dtype)
        out = jnp.einsum("bhqk,bhkd->bhqd", attn, v)
        out = out.transpose(0, 2, 1, 3).reshape(b, n, c)
        out = jnp.einsum("bnc,dc->bnd", out, out_w) + out_b
        return x + out


class FFN(nn.Module):
    """mmcv FFN: Linear -> ReLU -> Linear with identity residual."""

    embed_dim: int
    feedforward_dim: int

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        y = nn.Dense(self.feedforward_dim, name="fc1",
                     kernel_init=nn.initializers.xavier_uniform())(x)
        y = nn.relu(y)
        y = nn.Dense(self.embed_dim, name="fc2",
                     kernel_init=nn.initializers.xavier_uniform())(y)
        return x + y


def sine_positional_encoding(h: int, w: int, num_feats: int = 128,
                             temperature: float = 10000.0,
                             normalize: bool = True,
                             scale: float = 2 * np.pi,
                             eps: float = 1e-6,
                             dtype=jnp.float32) -> jax.Array:
    """DETR-style sine positional encoding, (H, W, 2*num_feats).

    reference: mmdet SinePositionalEncoding
    (/root/reference/mmdet/models/utils/positional_encoding.py:11), used by
    SemanticFPNWrapper at level 3 with an all-valid mask.
    """
    y_embed = jnp.arange(1, h + 1, dtype=jnp.float32)[:, None] * jnp.ones((1, w))
    x_embed = jnp.ones((h, 1)) * jnp.arange(1, w + 1, dtype=jnp.float32)[None, :]
    if normalize:
        y_embed = y_embed / (y_embed[-1:, :] + eps) * scale
        x_embed = x_embed / (x_embed[:, -1:] + eps) * scale
    dim_t = jnp.arange(num_feats, dtype=jnp.float32)
    dim_t = temperature ** (2 * (dim_t // 2) / num_feats)
    pos_x = x_embed[:, :, None] / dim_t
    pos_y = y_embed[:, :, None] / dim_t
    # interleave sin/cos over pairs
    pos_x = jnp.stack([jnp.sin(pos_x[:, :, 0::2]), jnp.cos(pos_x[:, :, 1::2])],
                      axis=3).reshape(h, w, num_feats)
    pos_y = jnp.stack([jnp.sin(pos_y[:, :, 0::2]), jnp.cos(pos_y[:, :, 1::2])],
                      axis=3).reshape(h, w, num_feats)
    pos = jnp.concatenate([pos_y, pos_x], axis=-1)
    return pos.astype(dtype)
