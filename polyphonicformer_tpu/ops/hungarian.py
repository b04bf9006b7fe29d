"""Exact linear-sum-assignment on device.

The reference syncs the cost matrix to host and calls scipy's Hungarian once
per image per stage (4x per image per training step,
/root/reference/polyphonic/funcs/assigner.py:511-533) — a device->host->device
round-trip each time.  Here we implement the same shortest-augmenting-path
(Jonker-Volgenant) algorithm with ``lax`` control flow so the whole matching
lives inside the jitted train step and vmaps over the batch.

The solver is exact: it produces an assignment with the same optimal total
cost as ``scipy.optimize.linear_sum_assignment`` (ties may be broken
differently; ties do not affect the optimum).

Shapes are static.  Rectangular problems (num_gt < num_preds) solve
directly with one augmenting iteration per ROW (scipy lsap's form) — the
serial iteration count, not the per-iteration vector work, dominates
while_loop cost on TPU, so a 16x100 problem is ~6x faster than padding it
square.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax import lax

_INF = jnp.float32(1e30)


def _augmenting_path_step(cost, u, v, row4col, cur_row):
    """One Dijkstra-style shortest augmenting path from ``cur_row``.

    Returns (sink_col, min_val, path, shortest_path_costs, sr, sc).
    """
    n = cost.shape[1]

    def cond(state):
        _, _, _, _, _, _, sink, _ = state
        return sink < 0

    def body(state):
        i, min_val, remaining, spc, path, sr, sink, _ = state
        sr = sr.at[i].set(True)
        # relax edges from row i to all remaining columns
        r = min_val + cost[i] - u[i] - v
        better = (r < spc) & remaining
        spc = jnp.where(better, r, spc)
        path = jnp.where(better, i, path)
        # pick the remaining column with the smallest tentative cost
        masked = jnp.where(remaining, spc, _INF)
        j = jnp.argmin(masked)
        min_val = masked[j]
        remaining = remaining.at[j].set(False)
        # sink found if j is unassigned
        unassigned = row4col[j] < 0
        sink = jnp.where(unassigned, j, -1)
        next_i = jnp.where(unassigned, i, row4col[j])
        return next_i, min_val, remaining, spc, path, sr, sink, j

    r = cost.shape[0]
    init = (
        cur_row,
        jnp.float32(0.0),
        jnp.ones((n,), dtype=bool),  # remaining columns
        jnp.full((n,), _INF),  # shortest path costs
        jnp.full((n,), -1, dtype=jnp.int32),  # predecessor row per column
        jnp.zeros((r,), dtype=bool),  # scanned rows
        jnp.int32(-1),  # sink
        jnp.int32(-1),
    )
    _, min_val, remaining, spc, path, sr, sink, _ = lax.while_loop(cond, body, init)
    sc = ~remaining  # scanned columns
    return sink, min_val, path, spc, sr, sc


def solve_lsa(cost: jax.Array, row_valid: jax.Array | None = None) -> jax.Array:
    """Solve (possibly rectangular) LSA. Returns col4row: for each row, its
    assigned column (-1 for rows skipped via ``row_valid``).

    cost: (r, n) float32 with r <= n — one shortest-augmenting-path
    iteration PER ROW (scipy lsap's rectangular form), so tall-thin
    problems (few GTs vs many predictions) cost r Dijkstras, not n.

    row_valid: optional (r,) bool — rows to actually assign.  The serial
    augmentation count drops from r to ``sum(row_valid)``: rows are visited
    valid-first (row order never affects the LSA optimum) through a
    ``while_loop`` whose trip count is the valid count, so under a lockstep
    ``vmap`` the cost is max-over-lanes of the VALID rows, not the static
    padding capacity (max_things=64 padded GT capacity vs ~a handful of real
    instances per image).  ``lax.cond`` can't express this: vmap lowers it
    to select-of-both-branches, which would run every Dijkstra anyway.
    """
    r, n = cost.shape
    assert r <= n, "cost must have rows <= cols; transpose before calling"
    cost = cost.astype(jnp.float32)
    if row_valid is None:
        order = jnp.arange(r, dtype=jnp.int32)
        n_valid = jnp.int32(r)
    else:
        # stable argsort: valid rows first, original order preserved
        order = jnp.argsort(~row_valid, stable=True).astype(jnp.int32)
        n_valid = row_valid.sum().astype(jnp.int32)

    def outer(it, carry):
        cur_row = order[it]
        u, v, row4col, col4row = carry
        sink, min_val, path, spc, sr, sc = _augmenting_path_step(
            cost, u, v, row4col, cur_row
        )
        # update dual potentials
        u = u.at[cur_row].add(min_val)
        other = sr & (jnp.arange(r) != cur_row)
        # for scanned rows i != cur_row: u[i] += min_val - spc[col4row[i]]
        delta_u = jnp.where(other, min_val - spc[jnp.clip(col4row, 0, n - 1)], 0.0)
        u = u + delta_u
        v = jnp.where(sc, v - (min_val - spc), v)

        # augment along the alternating path ending at sink
        def aug_cond(s):
            _, _, _, done = s
            return ~done

        def aug_body(s):
            j, row4col, col4row, _ = s
            i = path[j]
            row4col = row4col.at[j].set(i)
            next_j = col4row[i]
            col4row = col4row.at[i].set(j)
            return next_j, row4col, col4row, i == cur_row

        _, row4col, col4row, _ = lax.while_loop(
            aug_cond, aug_body, (sink, row4col, col4row, False)
        )
        return u, v, row4col, col4row

    u = jnp.zeros((r,), jnp.float32)
    v = jnp.zeros((n,), jnp.float32)
    row4col = jnp.full((n,), -1, jnp.int32)
    col4row = jnp.full((r,), -1, jnp.int32)

    def w_cond(state):
        return state[0] < n_valid

    def w_body(state):
        it, carry = state
        return it + 1, outer(it, carry)

    _, (u, v, row4col, col4row) = lax.while_loop(
        w_cond, w_body, (jnp.int32(0), (u, v, row4col, col4row)))
    return col4row


@functools.partial(jax.jit, static_argnames=("num_cols",))
def match_gt_to_preds(cost_gt_pred: jax.Array, gt_valid: jax.Array,
                      num_cols: int | None = None) -> jax.Array:
    """Match GT rows to prediction columns, minimizing total cost.

    Args:
      cost_gt_pred: (MAX_GT, P) cost with rows = GT, cols = predictions.
        MAX_GT must be <= P.
      gt_valid: (MAX_GT,) bool; invalid rows are ignored.

    Returns:
      gt2pred: (MAX_GT,) int32 — for each GT row the matched prediction
        column, or -1 for invalid GT rows.
    """
    max_gt, p = cost_gt_pred.shape
    assert max_gt <= p, "more GT slots than predictions"
    del num_cols
    # neutralize invalid rows: constant rows don't perturb the optimum
    cost = jnp.where(gt_valid[:, None], cost_gt_pred.astype(jnp.float32), 0.0)
    # guard against non-finite costs
    cost = jnp.nan_to_num(cost, nan=1e8, posinf=1e8, neginf=-1e8)
    # rectangular solve over the VALID rows only: sum(gt_valid) Dijkstra
    # iterations, not max_gt — the serial while-loop count is the whole
    # cost of on-device matching
    gt2pred = solve_lsa(cost, row_valid=gt_valid)
    return jnp.where(gt_valid, gt2pred, -1)


def _use_pallas_lsa() -> bool:
    """Default ON for TPU backends (opt out with POLY_PALLAS_LSA=0); CPU
    always takes the lax implementation (identical semantics, tested)."""
    import os

    if os.environ.get("POLY_PALLAS_LSA", "1") == "0":
        return False
    try:
        return jax.devices()[0].platform in ("tpu", "axon")
    except Exception:
        return False


def match_gt_to_preds_batched(cost_gt_pred: jax.Array,
                              gt_valid: jax.Array) -> jax.Array:
    """Batched ``match_gt_to_preds``: (N, MAX_GT, P) costs, (N, MAX_GT)
    valid -> (N, MAX_GT) matched pred columns (-1 for invalid rows).

    On TPU the N lockstep problems solve inside ONE Pallas kernel
    (ops/pallas/lsa.py) — the whole state is VMEM-resident so each serial
    algorithm step is a handful of VPU ops instead of a multi-op XLA
    while-loop body.  Elsewhere (and under POLY_PALLAS_LSA=0) it is the
    vmapped lax solver."""
    if _use_pallas_lsa():
        from .pallas.lsa import solve_lsa_pallas

        return solve_lsa_pallas(cost_gt_pred, gt_valid)
    return jax.vmap(match_gt_to_preds)(cost_gt_pred, gt_valid)


def gt2pred_to_assignment(gt2pred: jax.Array, num_preds: int) -> jax.Array:
    """Invert a gt->pred matching into per-pred assigned gt index (-1 = bg).

    Returns pred2gt: (num_preds,) int32.
    """
    max_gt = gt2pred.shape[0]
    pred2gt = jnp.full((num_preds,), -1, jnp.int32)
    valid = gt2pred >= 0
    idx = jnp.where(valid, gt2pred, num_preds)  # dump invalid into overflow
    pred2gt = jnp.zeros((num_preds + 1,), jnp.int32) - 1
    pred2gt = pred2gt.at[idx].set(jnp.arange(max_gt, dtype=jnp.int32))
    return pred2gt[:num_preds]
