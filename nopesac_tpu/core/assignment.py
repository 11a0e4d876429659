"""Mutual-nearest-neighbour assignment extraction from OT log-scores.

Spec: camera_modules.py:15-34 (get_assignment_matrix, SuperGlue-style
mutual-max + threshold). Fully vectorised (no host sync), works on [B, M+1, N+1]
padded log-score matrices and returns a dense [B, M, N] 0/1 assignment.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp


def mutual_max_assignment(log_scores_padded: jax.Array, match_threshold: float) -> jax.Array:
    """[B, M+1, N+1] padded log scores -> [B, M, N] hard assignment (float).

    A pair (i, j) is assigned iff j = argmax_j s[i, :], i = argmax_i s[:, j]
    (mutual max over the non-dustbin block) and exp(s[i, j]) > threshold.
    """
    s = log_scores_padded[:, :-1, :-1]
    b, m, n = s.shape
    idx0 = jnp.argmax(s, axis=2)  # [B, M] best col per row
    idx1 = jnp.argmax(s, axis=1)  # [B, N] best row per col
    max0 = jnp.max(s, axis=2)  # [B, M]

    rows = jnp.arange(m)[None, :]
    mutual0 = rows == jnp.take_along_axis(idx1, idx0, axis=1)  # [B, M]
    mscores0 = jnp.where(mutual0, jnp.exp(max0), 0.0)
    valid0 = mutual0 & (mscores0 > match_threshold)  # [B, M]

    assignment = jax.nn.one_hot(idx0, n, dtype=s.dtype) * valid0[..., None].astype(s.dtype)
    return assignment


def assignment_to_sequence(assignment: jax.Array, max_matches: int):
    """Extract matched index pairs in row-major order, padded to max_matches.

    jit-safe replacement for the reference's `torch.nonzero` loop in
    get_pred_geo_sequence (camera_head.py:1352-1425).

    Args:
      assignment: [M, N] 0/1 matrix.
      max_matches: static pad length (the reference uses num_queries = 50).

    Returns (idx1[max_matches], idx2[max_matches], valid[max_matches] bool,
    num_matches scalar int32). Padding entries have idx = 0 and valid = False.
    """
    m, n = assignment.shape
    flat = assignment.reshape(-1) > 0
    flat_idx = jnp.arange(m * n, dtype=jnp.int32)
    key = jnp.where(flat, flat_idx, m * n)
    order = jnp.argsort(key)[:max_matches]
    valid = jnp.take(flat, order)
    idx1 = (order // n).astype(jnp.int32)
    idx2 = (order % n).astype(jnp.int32)
    idx1 = jnp.where(valid, idx1, 0)
    idx2 = jnp.where(valid, idx2, 0)
    num = jnp.sum(flat.astype(jnp.int32))
    return idx1, idx2, valid, jnp.minimum(num, max_matches)
