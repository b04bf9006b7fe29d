"""Fused Swin window attention as one Pallas kernel per window-row band.

The XLA lowering of window attention at dense resolutions is dominated by
layout machinery, not FLOPs: window partition/unpartition relayouts, head
split/merge transposes, and (nw, h, L, L) attention tensors round-tripping
HBM — Swin-L stage 0 measured ~20x off its FLOP roofline
(tools_dev/bench_swin_parts.py).  This kernel keeps one band of window rows
in VMEM and does the whole thing there:

  qkv (ws, Wp, 3C) band -> window regroup (sublane shape casts + a leading
  transpose, all in-register) -> per-head batched QK^T on the MXU ->
  +relative-position bias, +shift mask -> f32 softmax -> PV -> head concat
  via static lane slices -> un-regroup -> out (ws, Wp, C) band.

Numerics: QK^T/PV accumulate in f32 (the XLA path's bf16 dot outputs were
upcast for the bias add; the kernel is strictly closer to the reference's
f32 torch math).  Bias/mask add order and the f32 softmax match
models/swin.py exactly.

The op carries a custom VJP that recomputes through the pure-JAX
formulation (models/swin.py::_window_attention_math), so Swin training
works unchanged; serving never takes that path.

Reference semantics: WindowMSA at
/root/reference/mmdet/models/backbones/swin.py (qkv -> scaled QK^T + rpb
(+ shift mask) -> softmax -> PV -> proj), exercised via the swin converter
parity suite.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _make_kernel(ws: int, num_heads: int, c: int, with_mask: bool):
    hd = c // num_heads
    scale = 1.0 / float(hd) ** 0.5

    def body(qkv_ref, bias_ref, mask_ref, o_ref):
        wp = qkv_ref.shape[2]
        nw = wp // ws
        l = ws * ws

        # ONE window regroup for the whole block (f32: Mosaic's sublane
        # shape casts don't exist for packed bf16 sublanes), then per-head
        # work is static channel slices + MXU dots only
        x = qkv_ref[0].astype(jnp.float32)  # (ws, wp, 3C)
        t = jnp.transpose(x.reshape(ws, nw, ws, 3 * c),
                          (1, 0, 2, 3)).reshape(nw, l, 3 * c)
        head_outs = []
        for h in range(num_heads):
            off = h * hd
            q = t[:, :, off:off + hd]
            k = t[:, :, c + off:c + off + hd]
            v = t[:, :, 2 * c + off:2 * c + off + hd]
            attn = jax.lax.dot_general(
                q, k, dimension_numbers=(((2,), (2,)), ((0,), (0,))),
                preferred_element_type=jnp.float32) * scale  # (nw, L, L)
            attn = attn + bias_ref[h][None]
            if with_mask:
                attn = attn + mask_ref[:]
            p = jax.nn.softmax(attn, axis=-1)
            head_outs.append(jax.lax.dot_general(
                p, v, dimension_numbers=(((2,), (1,)), ((0,), (0,))),
                preferred_element_type=jnp.float32))
        out = jnp.concatenate(head_outs, axis=-1)  # (nw, L, C)
        out = jnp.transpose(out.reshape(nw, ws, ws, c),
                            (1, 0, 2, 3)).reshape(ws, wp, c)
        o_ref[0] = out.astype(o_ref.dtype)

    if with_mask:
        return body

    def body_nomask(qkv_ref, bias_ref, o_ref):
        return body(qkv_ref, bias_ref, None, o_ref)

    return body_nomask


def _window_attention_fwd(qkv: jax.Array, bias: jax.Array,
                          mask: jax.Array | None, num_heads: int, ws: int,
                          interpret: bool = False) -> jax.Array:
    """qkv: (B, Hp, Wp, 3C) with Hp/Wp multiples of ws; bias (h, L, L) f32;
    mask (nH*nW, L, L) f32 or None.  Returns (B, Hp, Wp, C).

    Columns tile into sublane-aligned groups of ``_COL_WINDOWS`` windows
    (zero-padded to the tile, cropped after — windows are independent, so
    the padded ones produce discarded garbage).  Small per-instance kernels
    keep Mosaic's unrolled-head compilation tractable; a full-Wp band at
    Swin-L stage 0 OOM-killed the compile helper."""
    b, hp, wp, c3 = qkv.shape
    c = c3 // 3
    l = ws * ws
    n_bands = hp // ws
    nw = wp // ws
    col_windows = 8  # 8 * ws = 56 block columns (sublane-aligned)
    col_tile = col_windows * ws
    wp_pad = -(-wp // col_tile) * col_tile
    nw_pad = wp_pad // ws
    n_ctiles = wp_pad // col_tile
    if wp_pad != wp:
        qkv = jnp.pad(qkv, ((0, 0), (0, 0), (0, wp_pad - wp), (0, 0)))
    kern = _make_kernel(ws, num_heads, c, mask is not None)
    in_specs = [
        pl.BlockSpec((1, ws, col_tile, c3), lambda i, j, k: (i, j, k, 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((num_heads, l, l), lambda i, j, k: (0, 0, 0),
                     memory_space=pltpu.VMEM),
    ]
    args = [qkv, bias]
    if mask is not None:
        assert mask.shape == (n_bands * nw, l, l), mask.shape
        if nw_pad != nw:
            mask = jnp.pad(mask.reshape(n_bands, nw, l, l),
                           ((0, 0), (0, nw_pad - nw), (0, 0), (0, 0))
                           ).reshape(n_bands * nw_pad, l, l)
        in_specs.append(pl.BlockSpec(
            (col_windows, l, l),
            lambda i, j, k: (j * n_ctiles + k, 0, 0),
            memory_space=pltpu.VMEM))
        args.append(mask)
    out = pl.pallas_call(
        kern,
        grid=(b, n_bands, n_ctiles),
        in_specs=in_specs,
        out_specs=pl.BlockSpec((1, ws, col_tile, c),
                               lambda i, j, k: (i, j, k, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((b, hp, wp_pad, c), qkv.dtype),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=64 * 2**20),
        interpret=interpret,
    )(*args)
    return out[:, :, :wp, :]


def _xla_reference(qkv, bias, mask, num_heads, ws):
    """Pure-JAX formulation (mirrors models/swin.py) used for the VJP."""
    b, hp, wp, c3 = qkv.shape
    c = c3 // 3
    hd = c // num_heads
    l = ws * ws
    x = qkv.reshape(b, hp // ws, ws, wp // ws, ws, c3)
    x = x.transpose(0, 1, 3, 2, 4, 5).reshape(-1, l, c3)
    nw = x.shape[0]
    q = x[..., :c].reshape(nw, l, num_heads, hd)
    k = x[..., c:2 * c].reshape(nw, l, num_heads, hd)
    v = x[..., 2 * c:].reshape(nw, l, num_heads, hd)
    attn = jnp.einsum("wqhd,wkhd->whqk", q.astype(jnp.float32),
                      k.astype(jnp.float32)) / float(hd) ** 0.5
    attn = attn + bias[None]
    if mask is not None:
        attn = attn + jnp.tile(mask, (b, 1, 1))[:, None]
    p = jax.nn.softmax(attn, axis=-1).astype(qkv.dtype)
    out = jnp.einsum("whqk,wkhd->wqhd", p,
                     v.astype(qkv.dtype)).reshape(nw, l, c)
    out = out.reshape(b, hp // ws, wp // ws, ws, ws, c)
    return out.transpose(0, 1, 3, 2, 4, 5).reshape(b, hp, wp, c)


@functools.partial(jax.custom_vjp, nondiff_argnums=(3, 4, 5))
def window_attention_pallas(qkv, bias, mask, num_heads: int, ws: int,
                            interpret: bool = False):
    return _window_attention_fwd(qkv, bias, mask, num_heads, ws, interpret)


def _wa_fwd(qkv, bias, mask, num_heads, ws, interpret):
    out = _window_attention_fwd(qkv, bias, mask, num_heads, ws, interpret)
    return out, (qkv, bias, mask)


def _wa_bwd(num_heads, ws, _interpret, res, g):
    qkv, bias, mask = res
    # training path: differentiate the (equivalent) XLA formulation
    _, vjp = jax.vjp(
        lambda a, b_, m: _xla_reference(a, b_, m, num_heads, ws),
        qkv, bias, mask)
    return vjp(g)


window_attention_pallas.defvjp(_wa_fwd, _wa_bwd)
