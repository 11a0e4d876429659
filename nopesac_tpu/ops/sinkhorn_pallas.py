"""Pallas TPU kernel: masked log-domain Sinkhorn optimal transport.

The matching head iterates 200 Sinkhorn normalisations over a [B, N+1, N+1]
coupling matrix (N=50). As stock XLA this is a while-loop doing 400 HBM
round-trips over a tiny tensor; here the WHOLE loop runs inside one Pallas
kernel with the matrix resident in VMEM (one HBM read + one write per batch
element), and compiles through Mosaic in seconds.

Masking semantics match core/sinkhorn.py exactly: invalid rows/cols carry
-1e5 scores and -1e5 log-marginals, making their updates inert. The lane
padding (to the 128-lane tile) reuses the same convention, so padded lanes
are just more invalid columns.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax import lax
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..core.sinkhorn import masked_ot_prologue

_INF = 1e5


def _round_up(x: int, m: int) -> int:
    return ((x + m - 1) // m) * m


def _sinkhorn_kernel(scores_ref, log_mu_ref, log_nu_ref, out_ref, *, iters: int):
    z = scores_ref[0]  # [R, C] f32 in VMEM
    log_mu = log_mu_ref[0]  # [R, 1]
    log_nu = log_nu_ref[0]  # [1, C]

    def lse_cols(m):  # logsumexp over axis 1 -> [R, 1]
        mx = jnp.max(m, axis=1, keepdims=True)
        return mx + jnp.log(jnp.sum(jnp.exp(m - mx), axis=1, keepdims=True))

    def lse_rows(m):  # logsumexp over axis 0 -> [1, C]
        mx = jnp.max(m, axis=0, keepdims=True)
        return mx + jnp.log(jnp.sum(jnp.exp(m - mx), axis=0, keepdims=True))

    def body(_, uv):
        u, v = uv
        u = log_mu - lse_cols(z + v)
        v = log_nu - lse_rows(z + u)
        return u, v

    u0 = jnp.zeros_like(log_mu)
    v0 = jnp.zeros_like(log_nu)
    u, v = lax.fori_loop(0, iters, body, (u0, v0))
    out_ref[0] = z + u + v


def log_optimal_transport_masked_pallas(
    scores: jax.Array,
    alpha: jax.Array,
    iters: int,
    row_masks: jax.Array | None = None,
    col_masks: jax.Array | None = None,
    interpret: bool = False,
) -> jax.Array:
    """Drop-in replacement for core.sinkhorn.log_optimal_transport_masked.

    scores: [B, M, N]; returns [B, M+1, N+1] log matching scores.
    """
    b, m, n = scores.shape
    dtype = jnp.float32
    scores = scores.astype(dtype)
    # the dustbin-padding/masking/marginal algebra is SHARED with the lax
    # implementation so the two paths cannot drift (core/sinkhorn.py)
    padded, log_mu, log_nu, norm, _, _ = masked_ot_prologue(
        scores, alpha, row_masks, col_masks)

    # pad to TPU f32 tiles: rows to 8, cols (lanes) to 128; padding behaves
    # like more invalid rows/cols (-inf scores and marginals)
    rows, cols = m + 1, n + 1
    rp, cp = _round_up(rows, 8), _round_up(cols, 128)
    z = jnp.full((b, rp, cp), -_INF, dtype).at[:, :rows, :cols].set(padded)
    mu = jnp.full((b, rp, 1), -_INF, dtype).at[:, :rows, 0].set(log_mu)
    nu = jnp.full((b, 1, cp), -_INF, dtype).at[:, 0, :cols].set(log_nu)

    kernel = functools.partial(_sinkhorn_kernel, iters=iters)
    out = pl.pallas_call(
        kernel,
        grid=(b,),
        in_specs=[
            pl.BlockSpec((1, rp, cp), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, rp, 1), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, cp), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, rp, cp), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((b, rp, cp), dtype),
        interpret=interpret,
    )(z, mu, nu)

    return out[:, :rows, :cols] - norm[:, None, None]
