"""Resize ops with exact PyTorch interpolation semantics, expressed as dense
matmuls so XLA maps them onto the MXU.

The reference model's accuracy is sensitive to interpolation conventions
(bilinear ``align_corners=False`` for masks/depth rescale, asymmetric
``nearest`` for GT depth downsampling — see
/root/reference/polyphonic/kernel_update_head.py:593-626 and
/root/reference/polyphonic/polyphonic_former.py:91-94).  ``jax.image.resize``
uses different boundary handling, so we build the interpolation operators
explicitly:

* bilinear: out = R_h @ x @ R_w^T where R are (out, in) row-stochastic
  matrices derived from the half-pixel mapping src = (i + 0.5) * in/out - 0.5.
  Dense matmul is both exact and fast on TPU (MXU) for the sizes used here.
* nearest (PyTorch ``mode='nearest'``): src = floor(i * in/out), a gather.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np


def _on_tpu() -> bool:
    try:
        return jax.devices()[0].platform in ("tpu", "axon")
    except Exception:
        return False


@functools.lru_cache(maxsize=64)
def _bilinear_matrix(in_size: int, out_size: int) -> np.ndarray:
    """(out_size, in_size) interpolation matrix, PyTorch align_corners=False."""
    i = np.arange(out_size, dtype=np.float64)
    src = (i + 0.5) * (in_size / out_size) - 0.5
    x0 = np.floor(src)
    lam = src - x0
    x0c = np.clip(x0, 0, in_size - 1).astype(np.int64)
    x1c = np.clip(x0 + 1, 0, in_size - 1).astype(np.int64)
    mat = np.zeros((out_size, in_size), dtype=np.float32)
    rows = np.arange(out_size)
    np.add.at(mat, (rows, x0c), (1.0 - lam).astype(np.float32))
    np.add.at(mat, (rows, x1c), lam.astype(np.float32))
    return mat


@functools.lru_cache(maxsize=64)
def _nearest_indices(in_size: int, out_size: int) -> np.ndarray:
    """PyTorch mode='nearest' index mapping (asymmetric, floor)."""
    i = np.arange(out_size, dtype=np.float64)
    src = np.floor(i * (in_size / out_size))
    return np.clip(src, 0, in_size - 1).astype(np.int32)


def _phase_weights(factor: int) -> np.ndarray:
    """Per-phase 2-tap weights for integer-factor bilinear upsampling
    (half-pixel mapping).  Returns (factor, 2) weights for taps
    (floor(src), floor(src)+1) with src = (p + 0.5)/factor - 0.5 offset from
    the base index."""
    p = np.arange(factor, dtype=np.float64)
    src = (p + 0.5) / factor - 0.5  # in (-1, 1)
    lam = src - np.floor(src)
    return np.stack([1.0 - lam, lam], axis=1).astype(np.float32), \
        np.floor(src).astype(np.int64)


def _upsample_int_factor_1d(x: jax.Array, factor: int, axis: int) -> jax.Array:
    """Exact torch-bilinear upsample by an integer factor along one axis via
    phase decomposition: each output phase is a 2-tap lerp of (possibly
    shifted) input rows.  O(size) vector work instead of a dense matmul over
    a 99.9%-sparse interpolation matrix."""
    weights, base = _phase_weights(factor)
    x = jnp.moveaxis(x, axis, -1)
    n = x.shape[-1]
    # edge-replicated neighbors (torch clamps indices at the borders)
    left = jnp.concatenate([x[..., :1], x[..., :-1]], axis=-1)
    right = jnp.concatenate([x[..., 1:], x[..., -1:]], axis=-1)
    phases = []
    for p in range(factor):
        w0, w1 = float(weights[p, 0]), float(weights[p, 1])
        if base[p] == -1:  # taps (i-1, i)
            v = jnp.asarray(w0, x.dtype) * left + jnp.asarray(w1, x.dtype) * x
        else:  # taps (i, i+1)
            v = jnp.asarray(w0, x.dtype) * x + jnp.asarray(w1, x.dtype) * right
        phases.append(v)
    out = jnp.stack(phases, axis=-1).reshape(x.shape[:-1] + (n * factor,))
    return jnp.moveaxis(out, -1, axis)


def _upsample_int_factor_rows(x: jax.Array, factor: int) -> jax.Array:
    """``_upsample_int_factor_1d`` specialized to axis=-2, TRANSPOSE-FREE.

    The generic path moves the axis to minor and back — two full relayouts
    of the volume plus the interleave, which measured ~10x off HBM
    bandwidth on (4, 1, 111, h, w) training volumes
    (tools_dev/bench_machinery.py).  Row shifts are cheap concats on the
    sublane axis and the phase interleave is one (..., H, f, W) ->
    (..., H*f, W) reshape; arithmetic per output element is identical, so
    the result is bit-equal.
    """
    weights, base = _phase_weights(factor)
    left = jnp.concatenate([x[..., :1, :], x[..., :-1, :]], axis=-2)
    right = jnp.concatenate([x[..., 1:, :], x[..., -1:, :]], axis=-2)
    phases = []
    for p in range(factor):
        w0, w1 = float(weights[p, 0]), float(weights[p, 1])
        if base[p] == -1:  # taps (i-1, i)
            v = jnp.asarray(w0, x.dtype) * left + jnp.asarray(w1, x.dtype) * x
        else:  # taps (i, i+1)
            v = jnp.asarray(w0, x.dtype) * x + jnp.asarray(w1, x.dtype) * right
        phases.append(v)
    out = jnp.stack(phases, axis=-2)  # (..., H, f, W)
    return out.reshape(x.shape[:-2] + (x.shape[-2] * factor, x.shape[-1]))


def resize_bilinear(x: jax.Array, out_hw: tuple, precise: bool = True) -> jax.Array:
    """Bilinear resize of the last two axes (..., H, W) with torch
    align_corners=False semantics.

    precise=True computes in f32 at HIGHEST matmul precision (bit-parity
    with torch); precise=False keeps the input dtype (bf16 serving path,
    2x HBM traffic saved on the full-resolution mask stacks).

    Integer-factor upsampling uses phase decomposition (2-tap lerps of
    shifted copies) — same math, ~20x less work than the dense
    interpolation-matrix matmul.
    """
    out_h, out_w = int(out_hw[0]), int(out_hw[1])
    *lead, in_h, in_w = x.shape
    if (in_h, in_w) == (out_h, out_w):
        return x
    if out_h % in_h == 0 and out_w % in_w == 0 and out_h // in_h <= 8 \
            and out_w // in_w <= 8:
        import os

        dtype = x.dtype
        xf = x.astype(jnp.float32) if precise else x
        impl = os.environ.get("POLY_UPSAMPLE_IMPL", "pallas")
        if impl == "pallas" and precise and out_h // in_h == out_w // in_w \
                and _on_tpu():
            from .pallas.upsample2 import fits_vmem, upsample_int_pallas

            if fits_vmem(in_h, in_w, out_h // in_h):
                # one-pass VMEM kernel, value-equal to the phase path below;
                # the XLA interleaves lower to full-volume relayouts (~10x
                # off bandwidth — tools_dev/bench_upsample.py)
                flat = xf.astype(jnp.float32).reshape((-1, in_h, in_w))
                y = upsample_int_pallas(flat, out_h // in_h).reshape(
                    x.shape[:-2] + (out_h, out_w))
                return y.astype(dtype)
        if impl == "rows":
            y = _upsample_int_factor_rows(xf, out_h // in_h)
        else:
            y = _upsample_int_factor_1d(xf, out_h // in_h, -2)
        y = _upsample_int_factor_1d(y, out_w // in_w, -1)
        return y.astype(dtype)
    dtype = x.dtype
    if precise:
        xf = x.astype(jnp.float32)
        prec = jax.lax.Precision.HIGHEST
    else:
        xf = x
        prec = jax.lax.Precision.DEFAULT
    rh = jnp.asarray(_bilinear_matrix(in_h, out_h)).astype(xf.dtype)
    rw = jnp.asarray(_bilinear_matrix(in_w, out_w)).astype(xf.dtype)
    # (..., in_h, in_w) -> (..., out_h, in_w)
    y = jnp.einsum("oh,...hw->...ow", rh, xf, precision=prec)
    # -> (..., out_h, out_w)
    y = jnp.einsum("pw,...ow->...op", rw, y, precision=prec)
    return y.astype(dtype)


def resize_bilinear_nhwc(x: jax.Array, out_hw: tuple) -> jax.Array:
    """Bilinear resize for (B, H, W, C) layout."""
    out_h, out_w = int(out_hw[0]), int(out_hw[1])
    b, in_h, in_w, c = x.shape
    if (in_h, in_w) == (out_h, out_w):
        return x
    dtype = x.dtype
    xf = x.astype(jnp.float32)
    rh = jnp.asarray(_bilinear_matrix(in_h, out_h))
    rw = jnp.asarray(_bilinear_matrix(in_w, out_w))
    y = jnp.einsum("oh,bhwc->bowc", rh, xf, precision=jax.lax.Precision.HIGHEST)
    y = jnp.einsum("pw,bowc->bopc", rw, y, precision=jax.lax.Precision.HIGHEST)
    return y.astype(dtype)


def resize_nearest(x: jax.Array, out_hw: tuple) -> jax.Array:
    """Nearest resize of the last two axes with torch mode='nearest'
    (asymmetric floor) semantics."""
    out_h, out_w = int(out_hw[0]), int(out_hw[1])
    *lead, in_h, in_w = x.shape
    if (in_h, in_w) == (out_h, out_w):
        return x
    ih = jnp.asarray(_nearest_indices(in_h, out_h))
    iw = jnp.asarray(_nearest_indices(in_w, out_w))
    y = jnp.take(x, ih, axis=-2)
    y = jnp.take(y, iw, axis=-1)
    return y


def upsample2x_nearest_nhwc(x: jax.Array) -> jax.Array:
    """Fast 2x nearest upsample for NHWC (FPN top-down path)."""
    b, h, w, c = x.shape
    x = jnp.broadcast_to(x[:, :, None, :, None, :], (b, h, 2, w, 2, c))
    return x.reshape(b, 2 * h, 2 * w, c)
