"""Jonker-Volgenant linear-sum-assignment as ONE Pallas kernel per problem.

The lax implementation (ops/hungarian.py::solve_lsa) is exact but its
while_loop bodies each lower to ~15 separate XLA ops whose per-iteration
launch overhead dominates: the whole (G<=64) x (P<=128) problem state fits
in VMEM, so a single Mosaic kernel runs the identical algorithm with every
inner step as a handful of VPU ops on (1, 128) vectors — no HBM traffic, no
per-op dispatch.  Grid = one program per problem (the batched lockstep
solves of train/losses.py become grid steps).

Semantics match scipy's rectangular ``linear_sum_assignment`` exactly (one
shortest-augmenting-path per valid row; ties broken by lowest column index,
like jnp.argmin).  Reference equivalent: the per-image scipy calls at
/root/reference/polyphonic/funcs/assigner.py:511-533.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax import lax
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_INF = 1e30  # python float: jnp scalars would be captured consts


def _lsa_kernel(cost_ref, valid_ref, out_ref):
    """One problem: cost (1, G, P) f32, valid (1, 1, G) i32 -> (1, 1, G)."""
    _, g, p = cost_ref.shape
    iota_p = lax.broadcasted_iota(jnp.int32, (1, p), 1)
    iota_g = lax.broadcasted_iota(jnp.int32, (1, g), 1)
    valid_vec = valid_ref[0, 0, :].reshape(1, g) != 0

    def dijkstra(cur_row, u, v, row4col):
        """Shortest augmenting path from cur_row.

        Returns (sink, min_val, path, spc, scanned_rows, scanned_cols)."""

        def cond(st):
            return st[6] < 0

        def body(st):
            # masks carried as int32 (Mosaic cannot yield i1 vectors)
            i, min_val, remaining, spc, path, sr, _sink = st
            rem = remaining != 0
            sr = jnp.where(iota_g == i, 1, sr)
            cost_i = cost_ref[0, pl.ds(i, 1), :]  # (1, P)
            u_i = jnp.sum(jnp.where(iota_g == i, u, 0.0))
            r = min_val + cost_i - u_i - v
            better = (r < spc) & rem
            spc = jnp.where(better, r, spc)
            path = jnp.where(better, i, path)
            masked = jnp.where(rem, spc, _INF)
            mv = jnp.min(masked)
            # first index attaining the min (same tie-break as argmin)
            j = jnp.min(jnp.where((masked == mv) & rem, iota_p, p))
            remaining = jnp.where(iota_p == j, 0, remaining)
            r4c_j = jnp.sum(jnp.where(iota_p == j, row4col, 0))
            unassigned = r4c_j < 0
            sink = jnp.where(unassigned, j, -1)
            next_i = jnp.where(unassigned, i, r4c_j)
            return next_i, mv, remaining, spc, path, sr, sink

        init = (cur_row, jnp.float32(0.0),
                jnp.ones((1, p), jnp.int32),
                jnp.full((1, p), _INF, jnp.float32),
                jnp.full((1, p), -1, jnp.int32),
                jnp.zeros((1, g), jnp.int32),
                jnp.int32(-1))
        _, mv, remaining, spc, path, sr, sink = lax.while_loop(cond, body, init)
        return sink, mv, path, spc, sr != 0, remaining == 0

    def augment(sink, cur_row, path, row4col, col4row):
        def cond(st):
            return st[3] == 0

        def body(st):
            j, row4col, col4row, _ = st
            i = jnp.sum(jnp.where(iota_p == j, path, 0))
            row4col = jnp.where(iota_p == j, i, row4col)
            next_j = jnp.sum(jnp.where(iota_g == i, col4row, 0))
            col4row = jnp.where(iota_g == i, j, col4row)
            return next_j, row4col, col4row, (i == cur_row).astype(jnp.int32)

        _, row4col, col4row, _ = lax.while_loop(
            cond, body, (sink, row4col, col4row, jnp.int32(0)))
        return row4col, col4row

    def outer(r, state):
        u, v, row4col, col4row = state

        def run(state):
            u, v, row4col, col4row = state
            sink, mv, path, spc, sr, sc = dijkstra(r, u, v, row4col)
            # dual updates (identical to ops/hungarian.py::solve_lsa)
            u = u + jnp.where(iota_g == r, mv, 0.0)
            # spc gathered at col4row, as a (1,P)@(P,G) one-hot matmul
            # (Mosaic has no vector-gather; the MXU contraction is exact
            # since exactly one f32 product per output is nonzero)
            c4r_safe = jnp.clip(col4row, 0, p - 1)  # (1, G)
            onehot_pg = (lax.broadcasted_iota(jnp.int32, (p, g), 0)
                         == jnp.broadcast_to(c4r_safe, (p, g)))
            spc_at = jnp.dot(spc, onehot_pg.astype(jnp.float32),
                             preferred_element_type=jnp.float32)  # (1, G)
            other = sr & (iota_g != r)
            u = u + jnp.where(other, mv - spc_at, 0.0)
            v = jnp.where(sc, v - (mv - spc), v)
            row4col, col4row = augment(sink, r, path, row4col, col4row)
            return u, v, row4col, col4row

        # Mosaic cannot legalize lax.cond with vector-typed results
        # (scf.yield), so invalid rows run too and their updates are
        # discarded by select.  Their cost rows are neutralized to 0, so
        # each terminates after ~1 Dijkstra iteration — the wasted work is
        # a couple of VPU ops per padded row.
        is_valid = jnp.sum(jnp.where(iota_g == r, valid_vec.astype(jnp.int32),
                                     0)) != 0
        new_state = run(state)
        return jax.tree_util.tree_map(
            lambda a, b: jnp.where(is_valid, a, b), new_state, state)

    u = jnp.zeros((1, g), jnp.float32)
    v = jnp.zeros((1, p), jnp.float32)
    row4col = jnp.full((1, p), -1, jnp.int32)
    col4row = jnp.full((1, g), -1, jnp.int32)
    _, _, _, col4row = lax.fori_loop(0, g, outer, (u, v, row4col, col4row))
    out_ref[0, 0, :] = jnp.where(valid_vec, col4row, -1)[0, :]


@functools.partial(jax.jit, static_argnames=("interpret",))
def solve_lsa_pallas(costs: jax.Array, valids: jax.Array,
                     interpret: bool = False) -> jax.Array:
    """Batched exact LSA. costs: (N, G, P) with G <= P; valids: (N, G) bool.

    Returns col4row (N, G) int32 (-1 for invalid rows).  Costs of invalid
    rows are neutralized (constant rows do not perturb the optimum) and
    non-finite entries clamped, matching ops/hungarian.py::match_gt_to_preds.
    """
    n, g, p = costs.shape
    assert g <= p, "cost must have rows <= cols"
    cost = jnp.where(valids[:, :, None], costs.astype(jnp.float32), 0.0)
    cost = jnp.nan_to_num(cost, nan=1e8, posinf=1e8, neginf=-1e8)
    p_pad = max(128, -(-p // 128) * 128)
    if p_pad != p:
        # padded columns carry a huge cost: never minimal while real
        # columns remain, and g <= p real columns always suffice
        cost = jnp.pad(cost, ((0, 0), (0, 0), (0, p_pad - p)),
                       constant_values=1e9)
    g_pad = -(-g // 8) * 8
    vi = valids.astype(jnp.int32)
    if g_pad != g:
        cost = jnp.pad(cost, ((0, 0), (0, g_pad - g), (0, 0)),
                       constant_values=0.0)
        vi = jnp.pad(vi, ((0, 0), (0, g_pad - g)))
    out = pl.pallas_call(
        _lsa_kernel,
        grid=(n,),
        in_specs=[
            pl.BlockSpec((1, g_pad, p_pad), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            # (N, 1, G) so the trailing block dims satisfy TPU tiling
            pl.BlockSpec((1, 1, g_pad), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, 1, g_pad), lambda i: (i, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((n, 1, g_pad), jnp.int32),
        interpret=interpret,
    )(cost, vi[:, None])
    return out[:, 0, :g]
