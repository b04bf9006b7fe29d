"""Bilinear grid sampling and flow warping (torch grid_sample semantics,
align_corners=True, zero padding) in pure XLA gathers.

Used by the flow-aligned FPN modules (models/aligned_fpn.py); the reference
relies on torch F.grid_sample (polyphonic/funcs/semantic_fpn.py:333-354).
"""
from __future__ import annotations

import jax
import jax.numpy as jnp


def grid_sample_bilinear(feat: jax.Array, grid: jax.Array) -> jax.Array:
    """feat: (H, W, C); grid: (Ho, Wo, 2) normalized coords (x, y) in [-1, 1]
    (align_corners=True). Out-of-range taps contribute zero."""
    h, w, c = feat.shape
    gx = (grid[..., 0] + 1.0) * 0.5 * (w - 1)
    gy = (grid[..., 1] + 1.0) * 0.5 * (h - 1)
    x0 = jnp.floor(gx)
    y0 = jnp.floor(gy)
    lx = gx - x0
    ly = gy - y0

    def tap(yi, xi, wgt):
        inside = (yi >= 0) & (yi < h) & (xi >= 0) & (xi < w)
        yc = jnp.clip(yi, 0, h - 1).astype(jnp.int32)
        xc = jnp.clip(xi, 0, w - 1).astype(jnp.int32)
        vals = feat.reshape(h * w, c)[yc * w + xc]
        return vals * (wgt * inside.astype(feat.dtype))[..., None]

    out = (tap(y0, x0, (1 - ly) * (1 - lx)) + tap(y0, x0 + 1, (1 - ly) * lx)
           + tap(y0 + 1, x0, ly * (1 - lx)) + tap(y0 + 1, x0 + 1, ly * lx))
    return out


def flow_warp(feat: jax.Array, flow: jax.Array, out_hw) -> jax.Array:
    """Warp feat (B, H, W, C) by a pixel-space flow (B, Ho, Wo, 2) as in the
    reference's flow_warp: grid = base_grid + flow / (Wo, Ho)."""
    out_h, out_w = out_hw
    ys = jnp.linspace(-1.0, 1.0, out_h)
    xs = jnp.linspace(-1.0, 1.0, out_w)
    base = jnp.stack(jnp.meshgrid(xs, ys, indexing="xy"), axis=-1)  # (Ho, Wo, 2)
    norm = jnp.asarray([out_w, out_h], feat.dtype)
    grid = base[None] + flow / norm
    return jax.vmap(grid_sample_bilinear)(feat, grid)
