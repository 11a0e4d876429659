"""Masked log-domain Sinkhorn optimal transport, jit/TPU friendly.

Spec: NopeSAC_Net/modeling/matching_net/matching_head.py:228-306
(log_sinkhorn_iterations / log_optimal_transport_withMask, GeoTransformer-style
masking with a learnable dustbin score). The reference hardcodes CUDA tensors
(matching_head.py:274-281); this version is backend-agnostic and uses
`lax.fori_loop` so the 100-200 iteration loop compiles to a single fused XLA
while-loop instead of unrolling.

All the masking algebra follows the reference exactly: invalid rows/cols get
score -inf (finite -1e5) and marginal weight -inf, which makes their u/v updates
inert while keeping logsumexp finite.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp
from jax import lax

_INF = 1e5


def log_sinkhorn_iterations(
    z: jax.Array, log_mu: jax.Array, log_nu: jax.Array, iters: int
) -> jax.Array:
    """Sinkhorn normalisation in log space.

    z: [B, M, N] couplings; log_mu: [B, M]; log_nu: [B, N].
    """

    def body(_, uv):
        u, v = uv
        u = log_mu - jax.nn.logsumexp(z + v[:, None, :], axis=2)
        v = log_nu - jax.nn.logsumexp(z + u[:, :, None], axis=1)
        return u, v

    u0 = jnp.zeros_like(log_mu)
    v0 = jnp.zeros_like(log_nu)
    u, v = lax.fori_loop(0, iters, body, (u0, v0))
    return z + u[:, :, None] + v[:, None, :]


def masked_ot_prologue(scores, alpha, row_masks, col_masks):
    """Dustbin padding + invalid masking + log marginals, shared by the lax
    implementation below and the Pallas kernel (ops/sinkhorn_pallas.py) so
    the two stay algebraically identical (matching_head.py:228-281).

    Returns (padded_scores [B,M+1,N+1], log_mu [B,M+1], log_nu [B,N+1],
    norm [B], padded_row_invalid [B,M+1], padded_col_invalid [B,N+1])."""
    b, m, n = scores.shape
    dtype = scores.dtype
    if row_masks is None:
        row_masks = jnp.ones((b, m), dtype=bool)
    if col_masks is None:
        col_masks = jnp.ones((b, n), dtype=bool)

    # Padded masks: dustbin row/col is always valid.
    padded_row_invalid = jnp.concatenate(
        [~row_masks, jnp.zeros((b, 1), dtype=bool)], axis=1
    )  # [B, M+1]
    padded_col_invalid = jnp.concatenate(
        [~col_masks, jnp.zeros((b, 1), dtype=bool)], axis=1
    )  # [B, N+1]
    padded_score_invalid = padded_row_invalid[:, :, None] | padded_col_invalid[:, None, :]

    alpha = jnp.asarray(alpha, dtype=dtype)
    padded_col = jnp.broadcast_to(alpha, (b, m, 1))
    padded_row = jnp.broadcast_to(alpha, (b, 1, n + 1))
    padded_scores = jnp.concatenate(
        [jnp.concatenate([scores, padded_col], axis=-1), padded_row], axis=1
    )
    padded_scores = jnp.where(padded_score_invalid, -_INF, padded_scores)

    num_valid_row = jnp.sum(row_masks.astype(dtype), axis=1)  # [B]
    num_valid_col = jnp.sum(col_masks.astype(dtype), axis=1)  # [B]
    norm = -jnp.log(num_valid_row + num_valid_col)  # [B]

    log_mu = jnp.concatenate(
        [jnp.broadcast_to(norm[:, None], (b, m)), (jnp.log(num_valid_col) + norm)[:, None]],
        axis=1,
    )
    log_mu = jnp.where(padded_row_invalid, -_INF, log_mu)
    log_nu = jnp.concatenate(
        [jnp.broadcast_to(norm[:, None], (b, n)), (jnp.log(num_valid_row) + norm)[:, None]],
        axis=1,
    )
    log_nu = jnp.where(padded_col_invalid, -_INF, log_nu)
    return (padded_scores, log_mu, log_nu, norm,
            padded_row_invalid, padded_col_invalid)


def log_optimal_transport_masked(
    scores: jax.Array,
    alpha: jax.Array,
    iters: int,
    row_masks: jax.Array | None = None,
    col_masks: jax.Array | None = None,
) -> jax.Array:
    """Masked OT with a learnable dustbin row/col.

    Args:
      scores: [B, M, N] affinity matrix.
      alpha: scalar learnable dustbin score.
      iters: number of Sinkhorn iterations (static).
      row_masks: [B, M] bool, True = valid row; None = all valid.
      col_masks: [B, N] bool, True = valid col; None = all valid.

    Returns: [B, M+1, N+1] log matching scores (probabilities scaled by the
    number of valid rows+cols, exactly as the reference does).
    """
    padded_scores, log_mu, log_nu, norm, _, _ = masked_ot_prologue(
        scores, alpha, row_masks, col_masks)
    out = log_sinkhorn_iterations(padded_scores, log_mu, log_nu, iters)
    return out - norm[:, None, None]
