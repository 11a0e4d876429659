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


def hungarian_device(cost_padded: jnp.ndarray, num_valid_cols: jnp.ndarray) -> jnp.ndarray:
    """Batched rectangular LSA via square padding.

    cost_padded: [B, N, N]; columns >= num_valid_cols[b] are dummy. Dummy
    columns are internally rewritten to (max real cost + 1) so the square
    optimum restricted to real columns equals the rectangular optimum while
    keeping float32 dual updates well-conditioned (a huge dummy constant
    would swamp small cost differences). Returns match: [B, N] int32,
    match[b, i] = assigned column, or -1 if row i got a dummy column.
    """
    b, n, _ = cost_padded.shape
    # Sanitize: non-finite entries (NaN propagated from a diverged loss, inf
    # from masked costs) would make the Dijkstra while_loop in lap_jv cycle
    # forever (no reachable sink). Replace them with a large finite value so
    # the solver always terminates; the surrounding step's NaN guard is then
    # responsible for reporting/skipping the bad update.
    finite = jnp.isfinite(cost_padded)
    finite_max = jnp.max(jnp.where(finite, cost_padded, -jnp.inf), axis=(1, 2))
    finite_max = jnp.where(jnp.isfinite(finite_max), finite_max, 0.0)
    big = (jnp.abs(finite_max) + 1.0) * 2.0 + 1e3
    cost_padded = jnp.where(finite, cost_padded, big[:, None, None])

    col_valid = jnp.arange(n)[None, :] < num_valid_cols[:, None]  # [B, N]
    real_max = jnp.max(
        jnp.where(col_valid[:, None, :], cost_padded, -jnp.inf), axis=(1, 2)
    )
    real_max = jnp.where(jnp.isfinite(real_max), real_max, 0.0)
    cost_padded = jnp.where(
        col_valid[:, None, :], cost_padded, (real_max + 1.0)[:, None, None]
    )
    col4row = jax.vmap(lap_jv)(cost_padded)
    return jnp.where(col4row < num_valid_cols[:, None], col4row, -1)


def hungarian_host(cost_padded: jnp.ndarray, num_valid_cols: jnp.ndarray) -> jnp.ndarray:
    """Same contract as hungarian_device but via scipy on host (oracle)."""

    def _solve(cost, nv):
        from scipy.optimize import linear_sum_assignment

        out = np.full((cost.shape[0], cost.shape[1]), -1, np.int32)
        res = np.full((cost.shape[0], cost.shape[1]), -1, np.int32)[:, 0]
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
