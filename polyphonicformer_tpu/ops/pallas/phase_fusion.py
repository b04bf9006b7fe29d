"""Fused panoptic-merge kernel: all bilinear-upsample phases + score-weighted
argmax + region areas + winner depth in one VMEM pass.

The phase-space fusion (infer/panoptic.py) still re-reads the stride-4
candidate stacks ~4x per phase from HBM (taps x phases).  This kernel keeps
one row-tile of the (K, h/4, w/4) stacks in VMEM and emits, for all
fy*fx phases at once:

  pix_arg   (fy, fx, h/4, w/4) int32  — per-phase argmax_k score_k * m_k
  depth_sel (fy, fx, h/4, w/4) f32    — depth of the winning candidate
  row_marg  (K, H) f32                — argmax-region count per full-res row
  col_marg  (K, W) f32                — argmax-region count per full-res col
  orig_area (K,) f32                  — |m_k >= 0.5| per candidate

The marginals are the load-bearing addition: every downstream consumer of
the (K, H, W) candidate masks (tight boxes, MAD RoI boxes, areas) is a
function of row/col counts, so the pipeline never materializes or re-reads
the 128MB mask stack (infer/pipeline.py).  mask_area = row_marg.sum(-1).

Mosaic-layout notes: every in-kernel value stays >= 2-D (scores enter as a
(K, 1, W) broadcast block; the area accumulators are (K, W) column partial
sums reduced outside).  Row halos are handled by passing edge-clamped
row-shifted copies (computed once in XLA); column shifts are internal
because tiles span the full width.
"""
from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _phase_taps(factor: int):
    p = np.arange(factor)
    src = (p + 0.5) / factor - 0.5
    base = np.floor(src).astype(int)
    lam = (src - base).astype(np.float32)
    return [(int(base[i]), float(1 - lam[i]), float(lam[i]))
            for i in range(factor)]


def _col_shift(x, dx: int):
    """Edge-clamped column shift of (..., w) values (tiles span full width)."""
    if dx == 0:
        return x
    if dx == -1:
        return jnp.concatenate([x[..., :1], x[..., :-1]], axis=-1)
    return jnp.concatenate([x[..., 1:], x[..., -1:]], axis=-1)


def _kernel(score3_ref, m_prev_ref, m_cur_ref, m_next_ref,
            d_prev_ref, d_cur_ref, d_next_ref,
            pix_ref, dep_ref, rowm_ref, colm_ref, oarea_ref,
            *, fy: int, fx: int, nf: int):
    """nf: number of FULL rows (argmax identity + marginals + depth).
    Rows [nf, K) are prune-folded: they only contribute an exact per-pixel
    max that, when it beats every full row, marks the pixel with the
    sentinel index ``nf`` (rendered void downstream — identical to the
    reference, where a below-threshold winner renders void).  Their
    marginals/areas/depth are skipped (those rows can never pass the keep
    gate, so nothing downstream reads them)."""
    i = pl.program_id(0)

    @pl.when(i == 0)
    def _():
        colm_ref[:] = jnp.zeros_like(colm_ref)
        oarea_ref[:] = jnp.zeros_like(oarea_ref)

    score3 = score3_ref[:]  # (K, 1, W)
    # refs stay bf16; upcast lazily inside each phase so the Mosaic stack
    # holds only one phase's worth of f32 intermediates
    rows = {-1: m_prev_ref, 0: m_cur_ref, 1: m_next_ref}
    drows = {-1: d_prev_ref, 0: d_cur_ref, 1: d_next_ref}
    k = rows[0].shape[0]
    pruned = nf < k
    kidx = jax.lax.broadcasted_iota(jnp.int32, (nf, 1, 1), 0)

    oarea = jnp.zeros_like(oarea_ref)
    taps_y = _phase_taps(fy)
    taps_x = _phase_taps(fx)
    pix_rows, dep_rows = [], []
    for py in range(fy):
        by, wy0, wy1 = taps_y[py]
        vy_m = (wy0 * rows[by][:].astype(jnp.float32)
                + wy1 * rows[by + 1][:].astype(jnp.float32))
        # depth is only selected for full-row winners: lerp nf rows, not K
        vy_d = (wy0 * drows[by][0:nf].astype(jnp.float32)
                + wy1 * drows[by + 1][0:nf].astype(jnp.float32))
        pix_cols, dep_cols = [], []
        rowm_py = jnp.zeros((rowm_ref.shape[2], rowm_ref.shape[1]),
                            jnp.float32)  # (nf, TR)
        for px in range(fx):
            bx, wx0, wx1 = taps_x[px]
            v = wx0 * _col_shift(vy_m, bx) + wx1 * _col_shift(vy_m, bx + 1)
            vd = wx0 * _col_shift(vy_d, bx) + wx1 * _col_shift(vy_d, bx + 1)
            prob = score3 * v  # (K, TR, W)
            prob_f = prob[0:nf]
            pa = jnp.argmax(prob_f, axis=0).astype(jnp.int32)  # (TR, W)
            if pruned:
                conf_f = jnp.max(prob_f, axis=0)
                vmax = jnp.max(prob[nf:], axis=0)
                pa = jnp.where(vmax > conf_f, jnp.int32(nf), pa)
            region = (kidx == pa[None]).astype(jnp.float32)
            rowm_py = rowm_py + region.sum(axis=2)  # (nf, TR)
            # accumulate straight into VMEM: keeping fx (K, W) accumulators
            # live across the whole phase loop spilled ~70MB of vregs
            colm_ref[px] = colm_ref[px] + region.sum(axis=1)  # (nf, W)
            oarea = oarea + (v[0:nf] >= 0.5).astype(jnp.float32).sum(axis=1)
            pix_cols.append(pa)
            dep_cols.append((region * vd).sum(axis=0))
        # assemble interleaved layout VMEM-locally: (TR, W, fx)
        pix_rows.append(jnp.stack(pix_cols, axis=-1))
        dep_rows.append(jnp.stack(dep_cols, axis=-1))
        rowm_ref[py] = rowm_py.T  # (fy, TR, nf) layout: K rides the lanes
    # (TR, fy, W, fx): row-major-reshapes to the full-res raster outside
    pix_ref[:] = jnp.stack(pix_rows, axis=1)
    dep_ref[:] = jnp.stack(dep_rows, axis=1)
    oarea_ref[:] += oarea


def phase_fusion(probs: jax.Array, scores: jax.Array, depth: jax.Array,
                 fy: int = 4, fx: int = 4, interpret: bool = False,
                 n_full: int | None = None
                 ) -> Tuple[jax.Array, jax.Array, jax.Array, jax.Array]:
    """probs/depth: (K, hs, ws) stride-4 candidate maps (probabilities /
    metric depth); scores: (K,).  Returns per-phase maps + areas.

    n_full: rows [0, n_full) get full treatment; rows beyond are
    prune-folded into an exact max channel whose wins mark the pixel with
    the sentinel index (= padded n_full) — see _kernel.  Marginals/areas
    are returned for the full rows only ((min(nf, K), ...) shapes)."""
    kk, hs, ws = probs.shape
    kpad = (kk + 7) // 8 * 8
    nf = kpad if n_full is None else min((n_full + 7) // 8 * 8, kpad)
    tr = 8
    while hs % tr:
        tr //= 2

    def prep(x):
        # bf16 storage keeps the double-buffered tiles inside the 16MB VMEM
        # budget; math upcasts to f32 in-kernel (this kernel backs the bf16
        # serving path)
        x = jnp.pad(x.astype(jnp.bfloat16), ((0, kpad - kk), (0, 0), (0, 0)))
        prev = jnp.concatenate([x[:, :1], x[:, :-1]], axis=1)
        nxt = jnp.concatenate([x[:, 1:], x[:, -1:]], axis=1)
        return prev, x, nxt

    m_prev, m_cur, m_next = prep(probs)
    d_prev, d_cur, d_next = prep(depth)
    score3 = jnp.broadcast_to(
        jnp.pad(scores.astype(jnp.float32), (0, kpad - kk))[:, None, None],
        (kpad, 1, ws))

    grid = (hs // tr,)
    row_spec = pl.BlockSpec((kpad, tr, ws), lambda i: (0, i, 0),
                            memory_space=pltpu.VMEM)
    # output layout (hs, fy, ws, fx): a free row-major reshape away from the
    # (hs*fy, ws*fx) raster — no post-hoc interleave relayout needed
    out_map_spec = pl.BlockSpec((tr, fy, ws, fx), lambda i: (i, 0, 0, 0),
                                memory_space=pltpu.VMEM)
    rowm_spec = pl.BlockSpec((fy, tr, nf), lambda i: (0, i, 0),
                             memory_space=pltpu.VMEM)
    colm_spec = pl.BlockSpec((fx, nf, ws), lambda i: (0, 0, 0),
                             memory_space=pltpu.VMEM)
    acc_spec = pl.BlockSpec((nf, ws), lambda i: (0, 0),
                            memory_space=pltpu.VMEM)

    pix, dep, rowm, colm, oarea = pl.pallas_call(
        functools.partial(_kernel, fy=fy, fx=fx, nf=nf),
        grid=grid,
        in_specs=[
            pl.BlockSpec((kpad, 1, ws), lambda i: (0, 0, 0),
                         memory_space=pltpu.VMEM),
            row_spec, row_spec, row_spec, row_spec, row_spec, row_spec,
        ],
        out_specs=(out_map_spec, out_map_spec, rowm_spec, colm_spec, acc_spec),
        out_shape=(
            jax.ShapeDtypeStruct((hs, fy, ws, fx), jnp.int32),
            jax.ShapeDtypeStruct((hs, fy, ws, fx), jnp.float32),
            jax.ShapeDtypeStruct((fy, hs, nf), jnp.float32),
            jax.ShapeDtypeStruct((fx, nf, ws), jnp.float32),
            jax.ShapeDtypeStruct((nf, ws), jnp.float32),
        ),
        interpret=interpret,
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024),
    )(score3, m_prev, m_cur, m_next, d_prev, d_cur, d_next)
    pix = pix.reshape(hs * fy, ws * fx)
    dep = dep.reshape(hs * fy, ws * fx)
    kf = min(nf, kk)
    # (fy, hs, nf) -> (nf, hs, fy) -> (nf, H): full-res row r = ys*fy + py
    row_marg = rowm[..., :kf].transpose(2, 1, 0).reshape(kf, hs * fy)
    col_marg = colm[:, :kf].transpose(1, 2, 0).reshape(kf, ws * fx)
    return pix, dep, row_marg, col_marg, oarea[:kf].sum(axis=1)
