"""Fused hard-mask pooling Pallas kernel.

Computes ``out[b, n, c] = sum_hw [sigmoid(mask[b, n, hw]) > thr] * feat[b, hw, c]``
— the query/feature pooling at the heart of every kernel-update stage
(reference: the sigmoid+threshold+einsum at
/root/reference/polyphonic/kernel_update_head.py:236-242 and
kernel_head.py:313-320).

The fusion computes the thresholded mask tile-by-tile in VMEM and feeds the
MXU directly, so the (N, HW) binarized operand never round-trips through
HBM.  The backward pass is exact: the hard threshold has zero gradient to
the mask logits (matching torch, where ``(sigmoid(x) > t).float()`` is
non-differentiable), and d/dfeat = maskᵀ @ g is a second Pallas matmul.

Falls back to plain XLA ops on non-TPU backends.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _round_up(x: int, m: int) -> int:
    return (x + m - 1) // m * m


def _pool_kernel(mask_ref, feat_ref, out_ref, *, thr: float, n_hw_tiles: int):
    """Grid: (n_tiles, c_tiles, hw_tiles). Accumulates over the hw axis."""
    k = pl.program_id(2)

    @pl.when(k == 0)
    def _():
        out_ref[:] = jnp.zeros_like(out_ref)

    logits = mask_ref[:]  # (TILE_N, TILE_HW)
    hard = (jax.nn.sigmoid(logits) > thr).astype(jnp.float32)
    out_ref[:] += jnp.dot(hard, feat_ref[:],
                          preferred_element_type=jnp.float32)


def _masked_pool_tpu(mask_logits: jax.Array, feats: jax.Array,
                     thr: float) -> jax.Array:
    """mask_logits: (N, HW); feats: (HW, C). Returns (N, C) float32."""
    n, hw = mask_logits.shape
    hw2, c = feats.shape
    assert hw == hw2
    tile_n = min(_round_up(n, 8), 128)
    tile_hw = 512
    tile_c = min(_round_up(c, 128), 256)
    n_pad = _round_up(n, tile_n)
    hw_pad = _round_up(hw, tile_hw)
    c_pad = _round_up(c, tile_c)
    ml = jnp.pad(mask_logits.astype(jnp.float32),
                 ((0, n_pad - n), (0, hw_pad - hw)),
                 constant_values=-1e9)  # sigmoid(-1e9) = 0 < thr -> no effect
    ft = jnp.pad(feats.astype(jnp.float32),
                 ((0, hw_pad - hw), (0, c_pad - c)))
    grid = (n_pad // tile_n, c_pad // tile_c, hw_pad // tile_hw)
    out = pl.pallas_call(
        functools.partial(_pool_kernel, thr=thr, n_hw_tiles=grid[2]),
        grid=grid,
        in_specs=[
            pl.BlockSpec((tile_n, tile_hw), lambda i, j, k: (i, k),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((tile_hw, tile_c), lambda i, j, k: (k, j),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((tile_n, tile_c), lambda i, j, k: (i, j),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((n_pad, c_pad), jnp.float32),
    )(ml, ft)
    return out[:n, :c]


def _masked_pool_ref(mask_logits: jax.Array, feats: jax.Array,
                     thr: float) -> jax.Array:
    hard = (jax.nn.sigmoid(mask_logits.astype(jnp.float32)) > thr
            ).astype(jnp.float32)
    return jnp.einsum("nh,hc->nc", hard, feats.astype(jnp.float32))


import os


def _on_tpu() -> bool:
    # The Pallas path is opt-in: on the axon relay used in this environment,
    # pallas_call dispatch is dramatically slower than the XLA einsum (the
    # fused matmul is already MXU-bound under XLA).  Set
    # POLY_USE_PALLAS_MASK_POOL=1 on direct-attached TPUs.
    if os.environ.get("POLY_USE_PALLAS_MASK_POOL") != "1":
        return False
    try:
        return jax.devices()[0].platform in ("tpu", "axon")
    except Exception:
        return False


@functools.partial(jax.custom_vjp, nondiff_argnums=(2,))
def _masked_pool_2d(mask_logits: jax.Array, feats: jax.Array,
                    thr: float) -> jax.Array:
    if _on_tpu():
        return _masked_pool_tpu(mask_logits, feats, thr)
    return _masked_pool_ref(mask_logits, feats, thr)


def _fwd(mask_logits, feats, thr):
    out = _masked_pool_2d(mask_logits, feats, thr)
    # keep a dtype witness for feats: cotangents must match primal dtypes
    # (bf16 mixed-precision training feeds bf16 feats)
    return out, (mask_logits, jnp.zeros((), feats.dtype))


def _bwd(thr, res, g):
    mask_logits, fproto = res
    # d/dmask = 0 (hard threshold); d/dfeat = hardᵀ @ g
    hard = (jax.nn.sigmoid(mask_logits.astype(jnp.float32)) > thr
            ).astype(jnp.float32)
    dfeat = jnp.einsum("nh,nc->hc", hard, g.astype(jnp.float32))
    return jnp.zeros_like(mask_logits), dfeat.astype(fproto.dtype)


_masked_pool_2d.defvjp(_fwd, _bwd)


def masked_pool(mask_logits: jax.Array, feats: jax.Array,
                thr: float = 0.5) -> jax.Array:
    """Batched fused hard-mask pooling.

    mask_logits: (B, N, h, w); feats: (B, h, w, C). Returns (B, N, C).
    """
    b, n, h, w = mask_logits.shape
    c = feats.shape[-1]
    ml = mask_logits.reshape(b, n, h * w)
    ft = feats.reshape(b, h * w, c)
    return jax.vmap(lambda m, f: _masked_pool_2d(m, f, thr))(ml, ft)
