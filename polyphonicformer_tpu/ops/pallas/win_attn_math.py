"""Fused window-attention MATH on already-partitioned windows.

Round-3's full fused window attention (ops/pallas/window_attn.py) regrouped
windows inside the kernel and measured SLOWER than XLA: Mosaic has no bf16
sublane shape casts, so the regroup ran in f32 and ate the win.  The
calibrated micro-attribution (tools_dev/bench_swin_micro.py, REPS=64) shows
XLA's partition/pad/roll relayouts are in fact nearly free — what costs is
the attention math itself: at Swin-L stage 0 (2738 windows x 6 heads) the
qk/softmax/av chain is 4.4 ms of a 9.1 ms block, round-tripping the
(nw, h, 49, 49) attention tensor through HBM at f32.

This kernel therefore fuses ONLY the math, taking qkv in the window layout
XLA already produced: one VMEM pass per block of windows computes, per
head, QK^T (+rpb bias, +shift mask), an f32 softmax, and PV — the
attention tensor never leaves VMEM.  Heads are static lane slices of the
qkv block (hd=32 for every Swin variant, so slice offsets are 32-aligned),
the dots are Mosaic batched dot_generals with f32 accumulation, and the
per-head outputs are static lane-slice stores.

Numerics: QK accumulates in f32 and bias/mask add in f32 (the XLA path
rounds QK^T to bf16 before the adds) — strictly closer to the reference's
torch f32 math (/root/reference/mmdet/models/backbones/swin.py WindowMSA);
softmax-probability rounding to the compute dtype before PV matches the
XLA path.  Training differentiates a pure-jnp recompute (custom VJP), same
scheme as window_attn.py.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _make_kernel(num_heads: int, c: int, with_mask: bool):
    hd = c // num_heads
    scale = 1.0 / float(hd) ** 0.5

    def body(qkv_ref, bias_ref, mask_ref, o_ref):
        for h in range(num_heads):
            off = h * hd
            q = qkv_ref[:, :, off:off + hd]  # (wb, L, hd) compute dtype
            k = qkv_ref[:, :, c + off:c + off + hd]
            v = qkv_ref[:, :, 2 * c + off:2 * c + off + hd]
            attn = jax.lax.dot_general(
                q, k, dimension_numbers=(((2,), (2,)), ((0,), (0,))),
                preferred_element_type=jnp.float32) * scale  # (wb, L, L) f32
            attn = attn + bias_ref[h][None]
            if with_mask:
                attn = attn + mask_ref[...]
            p = jax.nn.softmax(attn, axis=-1).astype(o_ref.dtype)
            o_ref[:, :, off:off + hd] = jax.lax.dot_general(
                p, v, dimension_numbers=(((2,), (1,)), ((0,), (0,))),
                preferred_element_type=jnp.float32).astype(o_ref.dtype)

    if with_mask:
        return body

    def body_nomask(qkv_ref, bias_ref, o_ref):
        return body(qkv_ref, bias_ref, None, o_ref)

    return body_nomask


def _block_windows(l: int, c: int, itemsize: int,
                   budget: int = 10 * 2**20) -> int:
    """Windows per VMEM block: qkv + out double-buffered + mask, padded to
    the (8, 128) tile."""
    lp = -(-l // 8) * 8
    per_win = (lp * 3 * c + lp * c) * itemsize * 2  # qkv + out, x2 buffers
    per_win += lp * (-(-l // 128) * 128) * 4 * 2  # f32 mask
    wb = max(budget // per_win, 1)
    return min(64, max(8 * (wb // 8), 1))


def _fwd_call(qkv: jax.Array, bias: jax.Array, mask: jax.Array | None,
              num_heads: int, interpret: bool) -> jax.Array:
    nw, l, c3 = qkv.shape
    c = c3 // 3
    wb = _block_windows(l, c, qkv.dtype.itemsize)
    nw_pad = -(-nw // wb) * wb
    if nw_pad != nw:
        qkv = jnp.pad(qkv, ((0, nw_pad - nw), (0, 0), (0, 0)))
    qspec = pl.BlockSpec((wb, l, c3), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM)
    bspec = pl.BlockSpec((num_heads, l, l), lambda i: (0, 0, 0),
                         memory_space=pltpu.VMEM)
    in_specs = [qspec, bspec]
    args = [qkv, bias]
    if mask is not None:
        if mask.shape[0] != nw_pad:
            reps = nw // mask.shape[0]
            if reps > 1:
                mask = jnp.tile(mask, (reps, 1, 1))
            if nw_pad != mask.shape[0]:
                mask = jnp.pad(mask,
                               ((0, nw_pad - mask.shape[0]), (0, 0), (0, 0)))
        in_specs.append(pl.BlockSpec((wb, l, l), lambda i: (i, 0, 0),
                                     memory_space=pltpu.VMEM))
        args.append(mask)
    out = pl.pallas_call(
        _make_kernel(num_heads, c, mask is not None),
        grid=(nw_pad // wb,),
        in_specs=in_specs,
        out_specs=pl.BlockSpec((wb, l, c), lambda i: (i, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((nw_pad, l, c), qkv.dtype),
        compiler_params=pltpu.CompilerParams(vmem_limit_bytes=64 * 2**20),
        interpret=interpret,
    )(*args)
    return out[:nw]


def _jnp_reference(qkv: jax.Array, bias: jax.Array, mask: jax.Array | None,
                   num_heads: int) -> jax.Array:
    """Pure-jnp formulation (mirrors models/swin.py's XLA branch) for the
    training VJP."""
    import numpy as np

    nw, l, c3 = qkv.shape
    c = c3 // 3
    hd = c // num_heads
    q = qkv[..., :c].reshape(nw, l, num_heads, hd)
    k = qkv[..., c:2 * c].reshape(nw, l, num_heads, hd)
    v = qkv[..., 2 * c:].reshape(nw, l, num_heads, hd)
    attn = jnp.einsum("wqhd,wkhd->whqk", q.astype(jnp.float32),
                      k.astype(jnp.float32)) / np.sqrt(hd)
    attn = attn + bias[None]
    if mask is not None:
        reps = nw // mask.shape[0]
        m = jnp.tile(mask, (reps, 1, 1)) if reps > 1 else mask
        attn = attn + m[:, None]
    p = jax.nn.softmax(attn, axis=-1).astype(qkv.dtype)
    return jnp.einsum("whqk,wkhd->wqhd", p, v).reshape(nw, l, c)


@functools.partial(jax.custom_vjp, nondiff_argnums=(3, 4))
def window_attn_math(qkv, bias, mask, num_heads: int, interpret: bool = False):
    """qkv: (nw, L, 3C); bias: (num_heads, L, L) f32; mask: (nw or
    num_win_types, L, L) f32 or None.  Returns (nw, L, C) in qkv's dtype."""
    return _fwd_call(qkv, bias, mask, num_heads, interpret)


def _wam_fwd(qkv, bias, mask, num_heads, interpret):
    return _fwd_call(qkv, bias, mask, num_heads, interpret), (qkv, bias, mask)


def _wam_bwd(num_heads, _interpret, res, g):
    qkv, bias, mask = res
    if mask is None:
        _, vjp = jax.vjp(
            lambda a, b: _jnp_reference(a, b, None, num_heads), qkv, bias)
        return (*vjp(g), None)
    _, vjp = jax.vjp(
        lambda a, b, m: _jnp_reference(a, b, m, num_heads), qkv, bias, mask)
    return vjp(g)


window_attn_math.defvjp(_wam_fwd, _wam_bwd)
