"""Exact linear sum assignment, device-native (pure JAX) + host fallback.

The reference calls scipy.optimize.linear_sum_assignment on CPU inside the
training loss (matcher.py:164-166), forcing a GPU->CPU sync per image per
decoder level. Here the same exact Jonker-Volgenant shortest-augmenting-path
algorithm runs on-device under jit/vmap with fixed shapes (n <= 50), so the
whole train step stays one XLA program.

`hungarian_host` (jax.pure_callback -> scipy) is kept as an oracle/fallback.
"""
from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax

_INF = jnp.inf


@partial(jax.jit, static_argnums=())
def lap_jv(cost: jnp.ndarray) -> jnp.ndarray:
    """Solve square LAP exactly; cost: [N, N] -> col4row: [N] int32.

    col4row[i] = column assigned to row i (a permutation). Jonker-Volgenant
    with Dijkstra augmenting paths, O(N^3); all loops are lax primitives.
    """
    n = cost.shape[0]
    cost = cost.astype(jnp.float32)

    def solve_row(cur_row, state):
        u, v, col4row, row4col = state

        # --- Dijkstra from cur_row over columns. The scan adds one column to
        # SC per iteration, so > n iterations is impossible for well-formed
        # costs; the counter bound is pure insurance against numerical
        # corner cases cycling the loop (a wrong-but-finite assignment beats
        # a hung train step).
        def dij_cond(s):
            _, _, _, _, sink, _, _, it = s
            return (sink < 0) & (it <= n)

        def dij_body(s):
            i, min_val, spc, sc, sink, path, sr, it = s
            it = it + 1
            sr = sr.at[i].set(True)
            # relax all columns not in SC
            r = min_val + cost[i] - u[i] - v  # [N]
            better = (~sc) & (r < spc)
            spc = jnp.where(better, r, spc)
            path = jnp.where(better, i, path)
            # pick min over ~SC
            masked = jnp.where(sc, _INF, spc)
            j = jnp.argmin(masked).astype(jnp.int32)
            min_val = masked[j]
            sc = sc.at[j].set(True)
            sink = jnp.where(row4col[j] < 0, j, jnp.int32(-1))
            i = jnp.where(sink < 0, row4col[j], i)
            return i, min_val, spc, sc, sink, path, sr, it

        init = (
            cur_row.astype(jnp.int32),
            jnp.float32(0.0),
            jnp.full((n,), _INF, jnp.float32),  # shortest path costs
            jnp.zeros((n,), bool),  # SC
            jnp.int32(-1),  # sink
            jnp.full((n,), -1, jnp.int32),  # predecessor row per col
            jnp.zeros((n,), bool),  # SR
            jnp.int32(0),  # iteration bound (insurance)
        )
        _, min_val, spc, sc, sink, path, sr, _ = lax.while_loop(dij_cond, dij_body, init)
        # if the bound tripped (sink still -1), fall back to any free column
        free = jnp.argmin(jnp.where(row4col >= 0, 1, 0)).astype(jnp.int32)
        sink = jnp.where(sink < 0, free, sink)

        # --- dual updates
        u = u.at[cur_row].add(min_val)
        other = sr & (jnp.arange(n) != cur_row)
        u = jnp.where(other, u + min_val - spc[col4row], u)
        v = jnp.where(sc, v - (min_val - spc), v)

        # --- augment along the alternating path
        def aug_cond(s):
            _, _, _, done, it = s
            return (~done) & (it <= n)  # bound: alternating path length <= n

        def aug_body(s):
            j, col4row, row4col, _, it = s
            i = jnp.where(path[j] >= 0, path[j], cur_row)  # corrupt path guard
            row4col = row4col.at[j].set(i)
            nxt = col4row[i]
            col4row = col4row.at[i].set(j)
            return nxt, col4row, row4col, i == cur_row, it + 1

        _, col4row, row4col, _, _ = lax.while_loop(
            aug_cond, aug_body,
            (sink, col4row, row4col, jnp.array(False), jnp.int32(0)),
        )
        return u, v, col4row, row4col

    u0 = jnp.zeros((n,), jnp.float32)
    v0 = jnp.zeros((n,), jnp.float32)
    c0 = jnp.full((n,), -1, jnp.int32)
    r0 = jnp.full((n,), -1, jnp.int32)
    _, _, col4row, _ = lax.fori_loop(0, n, solve_row, (u0, v0, c0, r0))
    return col4row


def lap_jv_rect(cost: jnp.ndarray, num_rows) -> jnp.ndarray:
    """Rectangular LAP: assign each of the first `num_rows` rows a distinct
    column minimising total cost. cost: [M, N] (M <= N effective); num_rows
    is a traced scalar. Returns col4row: [M] int32 (column per row, -1 for
    rows >= num_rows).

    Same Jonker-Volgenant shortest-augmenting-path core as lap_jv, but it
    augments once per ACTIVE row instead of once per column-side slot. In
    the DETR matcher the active side is the GT planes (typically 5-20)
    while the query side is always 50, and each augmentation's Dijkstra
    terminates after visiting ~(#assigned columns) columns - so total inner
    iterations scale ~num_rows^2/2 instead of N^2/2 (an order of magnitude
    fewer sequential while-loop steps on typical batches). The outer loop is
    a while_loop on a traced bound, so vmap runs it max_b(num_rows_b) times.
    """
    m, n = cost.shape
    cost = cost.astype(jnp.float32)

    def solve_row(state):
        r, u, v, col4row, row4col = state
        active = r < num_rows

        def dij_cond(s):
            _, _, _, _, sink, _, _, it = s
            return (sink < 0) & (it <= n)

        def dij_body(s):
            i, min_val, spc, sc, sink, path, sr, it = s
            it = it + 1
            sr = sr.at[i].set(True)
            red = min_val + lax.dynamic_slice_in_dim(cost, i, 1, 0)[0] - u[i] - v
            better = (~sc) & (red < spc)
            spc = jnp.where(better, red, spc)
            path = jnp.where(better, i, path)
            masked = jnp.where(sc, _INF, spc)
            j = jnp.argmin(masked).astype(jnp.int32)
            min_val = masked[j]
            sc = sc.at[j].set(True)
            sink = jnp.where(row4col[j] < 0, j, jnp.int32(-1))
            i = jnp.where(sink < 0, row4col[j], i)
            return i, min_val, spc, sc, sink, path, sr, it

        init = (
            r.astype(jnp.int32),
            jnp.float32(0.0),
            jnp.full((n,), _INF, jnp.float32),
            jnp.zeros((n,), bool),
            # inactive rows (r >= num_rows, only reachable when another vmap
            # lane is still active) start "sunk" so their Dijkstra is a no-op
            jnp.where(active, jnp.int32(-1), jnp.int32(0)),
            jnp.full((n,), -1, jnp.int32),
            jnp.zeros((m,), bool),
            jnp.int32(0),
        )
        _, min_val, spc, sc, sink, path, sr, _ = lax.while_loop(dij_cond, dij_body, init)
        free = jnp.argmin(jnp.where(row4col >= 0, 1, 0)).astype(jnp.int32)
        sink = jnp.where(sink < 0, free, sink)

        # dual updates (guarded: inactive lanes keep their state)
        u_new = u.at[r].add(min_val)
        other = sr & (jnp.arange(m) != r)
        safe_c4r = jnp.maximum(col4row, 0)
        u_new = jnp.where(other, u_new + min_val - spc[safe_c4r], u_new)
        v_new = jnp.where(sc, v - (min_val - spc), v)
        u = jnp.where(active, u_new, u)
        v = jnp.where(active, v_new, v)

        def aug_cond(s):
            _, _, _, done, it = s
            return (~done) & (it <= n)

        def aug_body(s):
            j, col4row, row4col, _, it = s
            i = jnp.where(path[j] >= 0, path[j], r)
            row4col = row4col.at[j].set(i)
            nxt = col4row[i]
            col4row = col4row.at[i].set(j)
            return nxt, col4row, row4col, i == r, it + 1

        _, c4r_new, r4c_new, _, _ = lax.while_loop(
            aug_cond, aug_body,
            (sink, col4row, row4col, ~active, jnp.int32(0)),
        )
        col4row = jnp.where(active, c4r_new, col4row)
        row4col = jnp.where(active, r4c_new, row4col)
        return r + 1, u, v, col4row, row4col

    def outer_cond(state):
        r = state[0]
        return r < num_rows

    state = (
        jnp.int32(0),
        jnp.zeros((m,), jnp.float32),
        jnp.zeros((n,), jnp.float32),
        jnp.full((m,), -1, jnp.int32),
        jnp.full((n,), -1, jnp.int32),
    )
    _, _, _, col4row, _ = lax.while_loop(outer_cond, solve_row, state)
    return col4row


def hungarian_device(cost_padded: jnp.ndarray, num_valid_cols: jnp.ndarray) -> jnp.ndarray:
    """Batched rectangular LSA. cost_padded: [B, N, N]; columns >=
    num_valid_cols[b] are padding (never assigned). Returns match: [B, N]
    int32, match[b, i] = assigned column, or -1 if row i is unassigned.

    Solves the TRANSPOSED rectangular problem (rows = the num_valid_cols
    real columns) with lap_jv_rect, so the sequential augmentation count is
    the small side (#GT planes), not the padded 50 - see lap_jv_rect.
    Matches scipy.linear_sum_assignment on the [N, num_valid] submatrix
    (equal optimal cost; ties may resolve differently).
    """
    b, n, _ = cost_padded.shape
    # Sanitize: non-finite entries (NaN propagated from a diverged loss, inf
    # from masked costs) would make the Dijkstra while_loop cycle forever
    # (no reachable sink). Replace them with a large finite value so the
    # solver always terminates; the surrounding step's NaN guard is then
    # responsible for reporting/skipping the bad update.
    finite = jnp.isfinite(cost_padded)
    finite_max = jnp.max(jnp.where(finite, cost_padded, -jnp.inf), axis=(1, 2))
    finite_max = jnp.where(jnp.isfinite(finite_max), finite_max, 0.0)
    big = (jnp.abs(finite_max) + 1.0) * 2.0 + 1e3
    cost_padded = jnp.where(finite, cost_padded, big[:, None, None])

    cost_t = jnp.swapaxes(cost_padded, 1, 2)  # [B, cols->rows, rows->cols]
    col4gt = jax.vmap(lap_jv_rect)(cost_t, num_valid_cols)  # [B, N] row idx per gt
    # invert: match[b, col4gt[b, g]] = g
    g_idx = jnp.arange(n, dtype=jnp.int32)
    valid = col4gt >= 0
    match = jnp.full((b, n), -1, jnp.int32)
    match = match.at[
        jnp.arange(b)[:, None], jnp.where(valid, col4gt, n)
    ].set(jnp.where(valid, g_idx[None, :], -1), mode="drop")
    return match


def hungarian_host(cost_padded: jnp.ndarray, num_valid_cols: jnp.ndarray) -> jnp.ndarray:
    """Same contract as hungarian_device but via scipy on host (oracle)."""

    def _solve(cost, nv):
        from scipy.optimize import linear_sum_assignment

        outs = []
        for b in range(cost.shape[0]):
            rows, cols = linear_sum_assignment(np.asarray(cost[b], np.float64))
            m = np.full((cost.shape[1],), -1, np.int32)
            m[rows] = cols
            m = np.where(m < nv[b], m, -1)
            outs.append(m)
        return np.stack(outs).astype(np.int32)

    shape = jax.ShapeDtypeStruct((cost_padded.shape[0], cost_padded.shape[1]), jnp.int32)
    return jax.pure_callback(_solve, shape, cost_padded, num_valid_cols)
