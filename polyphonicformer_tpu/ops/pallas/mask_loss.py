"""Fused mask-loss reduction: BCE + dice partials + rank CE in ONE pass.

The train step's mask/dice/rank losses are reductions of the x2-upsampled
mask volume (N, Q, H, W) against the soft GT targets: mmdet-semantics BCE
(reference /root/reference/mmdet/models/losses/cross_entropy_loss.py),
dice with eps=1e-3 (mmdet/models/losses/dice_loss.py:9-46) and the rank
softmax-CE over the query axis
(/root/reference/polyphonic/kernel_update_head.py:415-441).  As separate
XLA ops each loss re-reads the (S, B, 111, 512, 1024) volume and the rank
group alone costs ~18 ms of a 167 ms step (ROUND3.md attribution); this
kernel computes every reduction the three losses need in a single VMEM
pass over (mask, target) blocks, with an analytic custom VJP that is a
second single pass.

Outputs per problem n (the caller folds (S, B) into N):
  stats (N, 128) f32: [:, 0] = sum_q,px pos_q * valid * BCE(m, t)
                      [:, 1] = sum_px rank_valid * (lse_q(m) - m[label])
  dice  (N, 3, Q) f32: a = sum sig*t*v,  b = sum sig^2*v,  c = sum t^2*v
                      (dice loss per row = 1 - 2a / (b + c + 2*eps))

The per-stage normalizations (BCE denominator, dice num_pos, rank mean
over B*H*W) stay outside — they are O(Q) math.  Gradients flow to the mask
logits only; targets/weights/labels are constants of the assignment.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_IGNORE = 255


def _pick_blocks(h: int, w: int):
    """Block (hb, wb): sublane-aligned rows, lanes capped at 512."""
    hb = 8 if h % 8 == 0 else h
    wb = w
    for cand in (512, 256, 128):
        if w % cand == 0:
            wb = cand
            break
    return hb, wb


def _rank_terms(m, lbl, q):
    """Per-pixel logsumexp over the query axis, picked logit and validity.

    m: (Q, hb, wb) f32; lbl: (hb, wb) int32.  The picked logit is a masked
    sum (one-hot compare against a Q-iota) because Mosaic has no vector
    gather along a leading axis."""
    mx = jnp.max(m, axis=0)
    lse = mx + jnp.log(jnp.sum(jnp.exp(m - mx[None]), axis=0))
    qiota = jax.lax.broadcasted_iota(jnp.int32, m.shape, 0)
    onehot = qiota == lbl[None]
    picked = jnp.sum(jnp.where(onehot, m, 0.0), axis=0)
    rvalid = ((lbl >= 0) & (lbl < q) & (lbl != _IGNORE)).astype(jnp.float32)
    return lse, picked, rvalid, onehot


def _sum_q(x):
    """(Q, hb, wb) -> (Q, 1) spatial sum.  Two single-axis reductions, kept
    >=2-D throughout: Mosaic's layout inference aborts on the fused
    axis=(1, 2) keepdims reduce and on any rank-1 vector (layout.h check)."""
    return jnp.sum(jnp.sum(x, axis=2, keepdims=True), axis=1)


def _fwd_kernel(m_ref, t_ref, pos_ref, v_ref, l_ref, stats_ref, dice_ref):
    first = (pl.program_id(1) == 0) & (pl.program_id(2) == 0)

    @pl.when(first)
    def _init():
        stats_ref[...] = jnp.zeros(stats_ref.shape, stats_ref.dtype)
        dice_ref[...] = jnp.zeros(dice_ref.shape, dice_ref.dtype)

    m = m_ref[0]  # (Q, hb, wb) f32
    t = t_ref[0]
    v = v_ref[0]  # (hb, wb) f32
    lbl = l_ref[0]  # (hb, wb) int32
    pos = pos_ref[0]  # (Q, 1) f32
    q = m.shape[0]

    bce = jnp.maximum(m, 0.0) - m * t + jnp.log1p(jnp.exp(-jnp.abs(m)))
    bce_s = jnp.sum(_sum_q(bce * v[None]) * pos)

    sig = jax.nn.sigmoid(m)
    sv = sig * v[None]
    a_q = _sum_q(sv * t)  # (Q, 1)
    b_q = _sum_q(sv * sig)
    c_q = _sum_q(t * t * v[None])

    lse, picked, rvalid, _ = _rank_terms(m, lbl, q)
    rank_s = jnp.sum(rvalid * (lse - picked))

    lane = jax.lax.broadcasted_iota(jnp.int32, stats_ref.shape, 2)
    stats_ref[...] += jnp.where(lane == 0, bce_s,
                                jnp.where(lane == 1, rank_s, 0.0))
    dlane = jax.lax.broadcasted_iota(jnp.int32, dice_ref.shape[1:], 1)
    dice_ref[...] += jnp.where(
        dlane == 0, a_q,
        jnp.where(dlane == 1, b_q, jnp.where(dlane == 2, c_q, 0.0)))[None]


def _bwd_kernel(m_ref, t_ref, pos_ref, v_ref, l_ref, gs_ref, gd_ref, dm_ref):
    m = m_ref[0]
    t = t_ref[0]
    v = v_ref[0]
    lbl = l_ref[0]
    pos = pos_ref[0]  # (Q, 1)
    gs = gs_ref[0]  # (1, 128): [0, 0]=g_bce, [0, 1]=g_rank
    gd = gd_ref[0]  # (Q, 128) lanes 0/1 = cotangents of a, b (c is M-const)
    q = m.shape[0]

    sig = jax.nn.sigmoid(m)
    vq = v[None]
    dm = (gs[0, 0] * pos.reshape(q, 1, 1)) * vq * (sig - t)
    sp = sig * (1.0 - sig)
    dm += (gd[:, 0:1].reshape(q, 1, 1) * t
           + 2.0 * gd[:, 1:2].reshape(q, 1, 1) * sig) * vq * sp
    lse, _picked, rvalid, onehot = _rank_terms(m, lbl, q)
    sm = jnp.exp(m - lse[None])
    dm += gs[0, 1] * rvalid[None] * (sm - onehot.astype(jnp.float32))
    dm_ref[0] = dm


def _specs(n, qn, h, w, hb, wb):
    # Mosaic requires the trailing two block dims to be 8/128-aligned OR
    # equal to the array dims; the small per-problem vectors therefore
    # carry a singleton sublane axis ((N, 1, Q) etc.) so their blocks
    # match the array exactly.
    mspec = pl.BlockSpec((1, qn, hb, wb), lambda i, j, k: (i, 0, j, k),
                         memory_space=pltpu.VMEM)
    pspec = pl.BlockSpec((1, qn, 1), lambda i, j, k: (i, 0, 0),
                         memory_space=pltpu.VMEM)
    vspec = pl.BlockSpec((1, hb, wb), lambda i, j, k: (i, j, k),
                         memory_space=pltpu.VMEM)
    return mspec, pspec, vspec


def _fwd_call(m, tgt, pos, valid, lbl, interpret):
    n, qn, h, w = m.shape
    hb, wb = _pick_blocks(h, w)
    mspec, pspec, vspec = _specs(n, qn, h, w, hb, wb)
    sspec = pl.BlockSpec((1, 1, 128), lambda i, j, k: (i, 0, 0),
                         memory_space=pltpu.VMEM)
    dspec = pl.BlockSpec((1, qn, 128), lambda i, j, k: (i, 0, 0),
                         memory_space=pltpu.VMEM)
    stats, dice = pl.pallas_call(
        _fwd_kernel,
        grid=(n, h // hb, w // wb),
        in_specs=[mspec, mspec, pspec, vspec, vspec],
        out_specs=[sspec, dspec],
        out_shape=[jax.ShapeDtypeStruct((n, 1, 128), jnp.float32),
                   jax.ShapeDtypeStruct((n, qn, 128), jnp.float32)],
        interpret=interpret,
    )(m, tgt, pos[..., None], valid, lbl)
    return stats[:, 0], jnp.transpose(dice[..., :3], (0, 2, 1))


def _bwd_call(m, tgt, pos, valid, lbl, gstats, gdice, interpret):
    n, qn, h, w = m.shape
    hb, wb = _pick_blocks(h, w)
    mspec, pspec, vspec = _specs(n, qn, h, w, hb, wb)
    gs_spec = pl.BlockSpec((1, 1, 128), lambda i, j, k: (i, 0, 0),
                           memory_space=pltpu.VMEM)
    gd_spec = pl.BlockSpec((1, qn, 128), lambda i, j, k: (i, 0, 0),
                           memory_space=pltpu.VMEM)
    gd_k = jnp.zeros((n, qn, 128), jnp.float32).at[..., :3].set(
        jnp.transpose(gdice, (0, 2, 1)))
    return pl.pallas_call(
        _bwd_kernel,
        grid=(n, h // hb, w // wb),
        in_specs=[mspec, mspec, pspec, vspec, vspec, gs_spec, gd_spec],
        out_specs=mspec,
        out_shape=jax.ShapeDtypeStruct(m.shape, jnp.float32),
        interpret=interpret,
    )(m, tgt, pos[..., None], valid, lbl, gstats[:, None], gd_k)


@functools.partial(jax.custom_vjp, nondiff_argnums=(5,))
def fused_mask_loss_stats(m, tgt, pos, valid, lbl, interpret=False):
    """m/tgt: (N, Q, H, W) f32; pos: (N, Q) f32; valid: (N, H, W) f32;
    lbl: (N, H, W) int32.  Returns (stats (N, 128), dice (N, 3, Q));
    differentiable in ``m`` only."""
    return tuple(_fwd_call(m, tgt, pos, valid, lbl, interpret))


def _fml_fwd(m, tgt, pos, valid, lbl, interpret):
    out = _fwd_call(m, tgt, pos, valid, lbl, interpret)
    return tuple(out), (m, tgt, pos, valid, lbl)


def _fml_bwd(interpret, res, g):
    import numpy as np

    m, tgt, pos, valid, lbl = res
    gstats, gdice = g
    dm = _bwd_call(m, tgt, pos, valid, lbl, gstats, gdice, interpret)
    # non-diff inputs: zero cotangents (callers stop_gradient them; XLA
    # dead-codes the zeros); int labels take a float0 cotangent
    return (dm, jnp.zeros_like(tgt), jnp.zeros_like(pos),
            jnp.zeros_like(valid),
            np.zeros(lbl.shape, dtype=jax.dtypes.float0))


fused_mask_loss_stats.defvjp(_fml_fwd, _fml_bwd)


def fits_vmem(qn: int, h: int, w: int, budget: int = 10 * 2**20) -> bool:
    """True when the (m, t) double-buffered blocks fit the VMEM budget."""
    hb, wb = _pick_blocks(h, w)
    return 2 * 2 * qn * hb * wb * 4 <= budget
