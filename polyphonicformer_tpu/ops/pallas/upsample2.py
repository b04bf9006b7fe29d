"""Exact integer-factor bilinear upsample (torch align_corners=False) as
Pallas kernels.

The XLA phase-decomposition path (ops/resize.py) is arithmetically minimal
but its interleaves lower to full-volume HBM relayouts: ~8 ms for a
(444, 128, 256) -> (256, 512) f32 x2 upsample whose HBM traffic bounds it
at ~0.4 ms (tools_dev/bench_upsample.py).  Here the shifts, lerps and both
phase interleaves happen in VMEM.

Per axis, phase p of factor f is a 2-tap lerp with the constants of
ops/resize.py::_phase_weights (same formula, same order -> values bit-equal
to the XLA path for dyadic weights; ulp-equal otherwise), applied
rows-then-columns in f32 with edge replication.  Mosaic supports the
SUBLANE phase interleave as a (h, f, w) -> (f*h, w) shape cast but not the
lane version, so the column pass transposes in VMEM and reuses the row
pass.

Blocking: the grid runs over (N, row-blocks).  Row neighbors across block
boundaries come from two XLA-precomputed shifted copies of the input (the
"halo" — reading x[i-1] is exactly reading shifted-x[i]), so every block is
self-contained; columns stay whole inside a block.  The custom VJP is the
exact transposed stencil, blocked the same way (its halo is the gradient
shifted by f rows: phase-p neighbors are f rows apart).

Reference semantics anchor: F.interpolate(..., mode='bilinear',
align_corners=False) as used for the mask/depth x2 upsamples
(/root/reference/polyphonic/kernel_update.py:131-143,
kernel_update_head.py:593-626) and the x4 merge-resolution upsamples
(kernel_update.py:471-535 via rescale_masks).
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _weights(f: int):
    from ..resize import _phase_weights

    return _phase_weights(f)


def _up_axis(x, left, right, f: int):
    """Phase upsample along the sublane axis with explicit neighbor arrays.

    x/left/right: (hb, w) where left[i] = x_global[i-1] (edge-replicated).
    Returns (f*hb, w)."""
    hb, w = x.shape
    weights, base = _weights(f)
    phases = []
    for p in range(f):
        w0, w1 = float(weights[p, 0]), float(weights[p, 1])
        if base[p] == -1:  # taps (i-1, i)
            phases.append(w0 * left + w1 * x)
        else:  # taps (i, i+1)
            phases.append(w0 * x + w1 * right)
    return jnp.stack(phases, axis=1).reshape(f * hb, w)


def _up_axis_intra(y, f: int):
    """Same, with neighbors taken inside the block (full axis present)."""
    left = jnp.concatenate([y[:1, :], y[:-1, :]], axis=0)
    right = jnp.concatenate([y[1:, :], y[-1:, :]], axis=0)
    return _up_axis(y, left, right, f)


def _make_fwd_kernel(f: int):
    def kernel(x_ref, lo_ref, hi_ref, o_ref):
        x = x_ref[0]  # (hb, w)
        y = _up_axis(x, lo_ref[0], hi_ref[0], f)  # (f*hb, w)
        yt = jnp.swapaxes(y, 0, 1)  # (w, f*hb) — columns become sublanes
        zt = _up_axis_intra(yt, f)  # (f*w, f*hb)
        o_ref[0] = jnp.swapaxes(zt, 0, 1)  # (f*hb, f*w)

    return kernel


def _down_axis(g, g_lo, g_hi, first, last, f: int):
    """Exact transpose of ``_up_axis``: (f*nb, w) -> (nb, w).

    g_lo/g_hi: g shifted down/up by f rows (phase-p row neighbors);
    first/last: (nb, 1) masks for the GLOBAL first/last source row."""
    fnb, w = g.shape
    nb = fnb // f
    weights, base = _weights(f)
    s = g.reshape(nb, f, w)
    s_lo = g_lo.reshape(nb, f, w)
    s_hi = g_hi.reshape(nb, f, w)
    dx = jnp.zeros((nb, w), jnp.float32)
    for p in range(f):
        gp = s[:, p, :]
        w0, w1 = float(weights[p, 0]), float(weights[p, 1])
        if base[p] == -1:  # out_p[i] = w0 x[i-1] + w1 x[i]; clamp at i=0
            dx = dx + w1 * gp + w0 * s_hi[:, p, :]
            dx = dx + jnp.where(first, w0 * gp, 0.0)
        else:  # out_p[i] = w0 x[i] + w1 x[i+1]; clamp at i=n-1
            dx = dx + w0 * gp + w1 * s_lo[:, p, :]
            dx = dx + jnp.where(last, w1 * gp, 0.0)
    return dx


def _down_axis_intra(g, f: int):
    fnb, w = g.shape
    nb = fnb // f
    g_lo = jnp.concatenate([jnp.zeros((f, w), g.dtype), g[:-f, :]], axis=0)
    g_hi = jnp.concatenate([g[f:, :], jnp.zeros((f, w), g.dtype)], axis=0)
    iota = jax.lax.broadcasted_iota(jnp.int32, (nb, 1), 0)
    return _down_axis(g, g_lo, g_hi, iota == 0, iota == nb - 1, f)


def _make_bwd_kernel(f: int, n_hblocks: int, hb: int, n_rows: int):
    def kernel(g_ref, glo_ref, ghi_ref, o_ref):
        # transpose of (rows then cols): invert cols (intra), then rows
        g = g_ref[0]  # (f*hb, f*w)
        gt = jnp.swapaxes(g, 0, 1)  # (f*w, f*hb)
        dt = _down_axis_intra(gt, f)  # (w, f*hb)
        d = jnp.swapaxes(dt, 0, 1)  # (f*hb, w)
        dlo = jnp.swapaxes(_down_axis_intra(jnp.swapaxes(glo_ref[0], 0, 1),
                                            f), 0, 1)
        dhi = jnp.swapaxes(_down_axis_intra(jnp.swapaxes(ghi_ref[0], 0, 1),
                                            f), 0, 1)
        jb = pl.program_id(1)
        iota = jax.lax.broadcasted_iota(jnp.int32, (hb, 1), 0) + jb * hb
        o_ref[0] = _down_axis(d, dlo, dhi, iota == 0, iota == n_rows - 1, f)

    return kernel


def _block_rows(h: int, w: int, f: int, budget: int = 4 * 2**20) -> int:
    """Largest row-block hb that divides h, is sublane-aligned (x8, so the
    f*hb output block is too), and fits the VMEM budget; else whole h."""
    per_row = w * 4 * (3 + 2 * f + 2 * f * f)
    cap = max(1, budget // max(per_row, 1))
    if h <= cap:
        return h
    best = h  # fallback: whole axis (fits_vmem gates callers)
    for hb in range(8, h, 8):
        if h % hb == 0 and hb <= cap:
            best = hb
    return best


def fits_vmem(h: int, w: int, f: int) -> bool:
    """True when some legal row-block keeps the kernel under its VMEM
    budget (callers fall back to the XLA path otherwise)."""
    per_row = w * 4 * (3 + 2 * f + 2 * f * f)
    return _block_rows(h, w, f) * per_row <= 6 * 2**20


def _call_fwd(x, f, interpret):
    n, h, w = x.shape
    lo = jnp.concatenate([x[:, :1, :], x[:, :-1, :]], axis=1)
    hi = jnp.concatenate([x[:, 1:, :], x[:, -1:, :]], axis=1)
    hb = _block_rows(h, w, f)
    spec = pl.BlockSpec((1, hb, w), lambda i, j: (i, j, 0),
                        memory_space=pltpu.VMEM)
    return pl.pallas_call(
        _make_fwd_kernel(f),
        grid=(n, h // hb),
        in_specs=[spec, spec, spec],
        out_specs=pl.BlockSpec((1, f * hb, f * w), lambda i, j: (i, j, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((n, f * h, f * w), jnp.float32),
        interpret=interpret,
    )(x, lo, hi)


def _call_bwd(g, f, interpret):
    n, fh, fw = g.shape
    h, w = fh // f, fw // f
    # phase-p row neighbors are f rows apart in g
    zeros = jnp.zeros_like(g[:, :f, :])
    glo = jnp.concatenate([zeros, g[:, :-f, :]], axis=1)
    ghi = jnp.concatenate([g[:, f:, :], zeros], axis=1)
    hb = _block_rows(h, w, f)
    gspec = pl.BlockSpec((1, f * hb, f * w), lambda i, j: (i, j, 0),
                         memory_space=pltpu.VMEM)
    return pl.pallas_call(
        _make_bwd_kernel(f, h // hb, hb, h),
        grid=(n, h // hb),
        in_specs=[gspec, gspec, gspec],
        out_specs=pl.BlockSpec((1, hb, w), lambda i, j: (i, j, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((n, h, w), jnp.float32),
        interpret=interpret,
    )(g, glo, ghi)


@functools.partial(jax.custom_vjp, nondiff_argnums=(1, 2))
def upsample_int_pallas(x: jax.Array, factor: int = 2,
                        interpret: bool = False) -> jax.Array:
    """x: (N, h, w) f32 -> (N, f*h, f*w) f32, matching the XLA phase path."""
    return _call_fwd(x, factor, interpret)


def _ui_fwd(x, factor, interpret):
    return _call_fwd(x, factor, interpret), None


def _ui_bwd(factor, interpret, _res, g):
    return (_call_bwd(g, factor, interpret),)


upsample_int_pallas.defvjp(_ui_fwd, _ui_bwd)


def upsample2_pallas(x: jax.Array, interpret: bool = False) -> jax.Array:
    """x2 alias (the original kernel's public name)."""
    return upsample_int_pallas(x, 2, interpret)
