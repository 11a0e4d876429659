"""Matching (Sinkhorn OT) supervision utilities.

Specs: matching_head.py:135-139 (NLL over GT correspondences) and
siamese_planeTR.py:566-623 (GT corr matrix over predicted plane indices,
with dustbin row/col).
"""
from __future__ import annotations

import jax
import jax.numpy as jnp


def matching_nll_loss(log_scores_padded: jnp.ndarray, gt_corr_matrix: jnp.ndarray) -> jnp.ndarray:
    """-2 * mean log-score over GT correspondences (matching_head.py:135-139).

    gt_corr_matrix: [B, N1+1, N2+1] bool (already intersected with validity).
    """
    clamped = jnp.minimum(log_scores_padded, 0.0)
    gt = gt_corr_matrix > 0
    total = jnp.sum(jnp.where(gt, -clamped, 0.0))
    count = jnp.maximum(jnp.sum(gt.astype(jnp.float32)), 1.0)
    return total / count * 2.0


def invert_match(match: jnp.ndarray, num_queries: int) -> jnp.ndarray:
    """[B, NQ] query->gt match (or -1) -> [B, NQ] gt->query (or NQ).

    Spec: siamese_planeTR.py:592-594 (gt2pred with NQ as the dustbin index).
    """

    def single(m):
        idx = jnp.where(m >= 0, m, num_queries)  # invalid -> overflow slot
        out = jnp.full((num_queries + 1,), num_queries, jnp.int32)
        out = out.at[idx].set(jnp.arange(num_queries, dtype=jnp.int32))
        return out[:num_queries]

    return jax.vmap(single)(match)


def build_pred_corr_matrix(
    match1: jnp.ndarray,  # [B, NQ] view-0 query -> gt (or -1)
    match2: jnp.ndarray,  # [B, NQ] view-1
    corr_idx1: jnp.ndarray,  # [B, M] gt corr indices view-0
    corr_idx2: jnp.ndarray,  # [B, M]
    corr_valid: jnp.ndarray,  # [B, M] bool
    num_queries: int,
) -> jnp.ndarray:
    """GT correspondence matrix over predicted plane indices, [B, NQ+1, NQ+1]
    bool with dustbin semantics (siamese_planeTR.py:566-623)."""
    nq = num_queries
    gt2pred1 = invert_match(match1, nq)  # [B, NQ]
    gt2pred2 = invert_match(match2, nq)

    p1 = jnp.take_along_axis(gt2pred1, jnp.minimum(corr_idx1, nq - 1), axis=1)
    p2 = jnp.take_along_axis(gt2pred2, jnp.minimum(corr_idx2, nq - 1), axis=1)
    # invalid corr entries route to the dustbin cell (overwritten below)
    p1 = jnp.where(corr_valid, p1, nq)
    p2 = jnp.where(corr_valid, p2, nq)

    def scatter(pp1, pp2):
        m = jnp.zeros((nq + 1, nq + 1), jnp.float32)
        return m.at[pp1, pp2].max(1.0)

    corr = jax.vmap(scatter)(p1, p2)
    sum_row = 1.0 - jnp.sum(corr[:, :-1, :], axis=1, keepdims=True)  # [B, 1, NQ+1]
    sum_col = 1.0 - jnp.sum(corr[:, :, :-1], axis=2, keepdims=True)  # [B, NQ+1, 1]
    corr = corr.at[:, -1:, :].set(sum_row)
    corr = corr.at[:, :, -1:].set(sum_col)
    corr = corr.at[:, -1, -1].set(0.0)
    return corr > 0


def intersect_with_valid(gt_corr_matrix, row_masks, col_masks):
    """Restrict the corr matrix to matched rows/cols (+ dustbin), matching
    matching_head.py:51-69."""
    b, n1 = row_masks.shape
    n2 = col_masks.shape[1]
    padded_rows = jnp.concatenate([row_masks, jnp.ones((b, 1), bool)], axis=1)
    padded_cols = jnp.concatenate([col_masks, jnp.ones((b, 1), bool)], axis=1)
    valid = padded_rows[:, :, None] & padded_cols[:, None, :]
    return gt_corr_matrix & valid
