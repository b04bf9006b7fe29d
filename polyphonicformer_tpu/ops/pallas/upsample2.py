"""Exact x2 bilinear upsample (torch align_corners=False) as Pallas kernels.

The XLA phase-decomposition path (ops/resize.py) is arithmetically minimal
but its interleaves lower to full-volume HBM relayouts: ~8 ms for a
(444, 128, 256) -> (444, 256, 512) f32 upsample whose HBM traffic bounds it
at ~0.4 ms (tools_dev/bench_upsample.py).  Here everything happens in VMEM
with one HBM read and one write per tile.

The half-pixel x2 mapping src = (o + 0.5)/2 - 0.5 gives per-axis taps
  out[2i]   = 0.25 * x[i-1] + 0.75 * x[i]   (edge: out[0]    = x[0])
  out[2i+1] = 0.75 * x[i]   + 0.25 * x[i+1] (edge: out[2n-1] = x[n-1])
applied rows-then-cols in f32 — the same operations in the same order as
the XLA path, so outputs are bit-identical (up to compiler algebraic
simplification on size-1 axes).  Mosaic supports the SUBLANE phase
interleave as a (h, 2, w) -> (2h, w) shape cast but not the lane version,
so the column pass transposes, reuses the row pass, and transposes back —
all in VMEM, where a transpose is register shuffles, not an HBM relayout.

The custom VJP is the exact transpose stencil (also one kernel), so the op
serves the training losses as well as serving.

Reference semantics anchor: F.interpolate(..., scale_factor=2,
mode='bilinear', align_corners=False) as used for the mask/depth x2
upsamples (/root/reference/polyphonic/kernel_update.py:131-143,
kernel_update_head.py:593-626 and the loss-side scaled_mask_preds).
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _up_rows(x: jax.Array) -> jax.Array:
    """(nb, h, w) -> (nb, 2h, w): x2 phase upsample along the sublane axis."""
    nb, h, w = x.shape
    left = jnp.concatenate([x[:, :1, :], x[:, :-1, :]], axis=1)
    right = jnp.concatenate([x[:, 1:, :], x[:, -1:, :]], axis=1)
    even = 0.25 * left + 0.75 * x
    odd = 0.75 * x + 0.25 * right
    return jnp.stack([even, odd], axis=2).reshape(nb, 2 * h, w)


def _down_rows(g: jax.Array) -> jax.Array:
    """Exact transpose of ``_up_rows``: (nb, 2n, w) -> (nb, n, w)."""
    nb, h2, w = g.shape
    n = h2 // 2
    s = g.reshape(nb, n, 2, w)
    even, odd = s[:, :, 0, :], s[:, :, 1, :]
    even_next = jnp.concatenate(
        [even[:, 1:, :], jnp.zeros_like(even[:, :1, :])], 1)
    odd_prev = jnp.concatenate(
        [jnp.zeros_like(odd[:, :1, :]), odd[:, :-1, :]], 1)
    dx = 0.75 * (even + odd) + 0.25 * (even_next + odd_prev)
    # clamped edge taps fold back onto the border rows
    first = (jax.lax.broadcasted_iota(jnp.int32, (1, n, 1), 1) == 0)
    last = (jax.lax.broadcasted_iota(jnp.int32, (1, n, 1), 1) == n - 1)
    dx = dx + jnp.where(first, 0.25 * even, 0.0)
    dx = dx + jnp.where(last, 0.25 * odd, 0.0)
    return dx


def _fwd_kernel(x_ref, o_ref):
    y = _up_rows(x_ref[:])  # (nb, 2h, w)
    yt = jnp.swapaxes(y, 1, 2)  # (nb, w, 2h)
    zt = _up_rows(yt)  # (nb, 2w, 2h)
    o_ref[:] = jnp.swapaxes(zt, 1, 2)  # (nb, 2h, 2w)


def _bwd_kernel(g_ref, o_ref):
    # transpose of (rows then cols): cols-transpose first, then rows
    gt = jnp.swapaxes(g_ref[:], 1, 2)  # (nb, 2w, 2h)
    dt = _down_rows(gt)  # (nb, w, 2h)
    d = jnp.swapaxes(dt, 1, 2)  # (nb, 2h, w)
    o_ref[:] = _down_rows(d)  # (nb, h, w)


def _block_rows(n: int, bytes_per_row: int, budget: int = 6 * 2**20) -> int:
    nb = max(1, min(n, budget // max(bytes_per_row, 1)))
    while n % nb:
        nb -= 1
    return nb


def _call(kernel, x, out_h, out_w, interpret):
    n, h, w = x.shape
    nb = _block_rows(n, (out_h * out_w + h * w) * 4 * 2)  # fwd+transposes
    return pl.pallas_call(
        kernel,
        grid=(n // nb,),
        in_specs=[pl.BlockSpec((nb, h, w), lambda i: (i, 0, 0),
                               memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec((nb, out_h, out_w), lambda i: (i, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((n, out_h, out_w), jnp.float32),
        interpret=interpret,
    )(x)


@functools.partial(jax.custom_vjp, nondiff_argnums=(1,))
def upsample2_pallas(x: jax.Array, interpret: bool = False) -> jax.Array:
    """x: (N, h, w) f32 -> (N, 2h, 2w) f32, bit-equal to the XLA phase path."""
    return _call(_fwd_kernel, x, x.shape[1] * 2, x.shape[2] * 2, interpret)


def _u2_fwd(x, interpret):
    return _call(_fwd_kernel, x, x.shape[1] * 2, x.shape[2] * 2,
                 interpret), None


def _u2_bwd(interpret, _res, g):
    return (_call(_bwd_kernel, g, g.shape[1] // 2, g.shape[2] // 2,
                  interpret),)


upsample2_pallas.defvjp(_u2_fwd, _u2_bwd)
