"""Pallas TPU kernel: fused upsample + focal/dice mask-loss reductions.

The detection criterion (losses/criterion.py, spec criterion.py:93-120)
upsamples every query's mask logits [B,NQ,120,160] -> [B,NQ,480,640] and
runs a sigmoid-focal + dice chain over the full-resolution volume. Under
XLA that materialises multiple ~1 GB intermediates per supervision level
(forward activations saved for the VJP), costing ~45 ms of a 155 ms train
step at batch 8.

This kernel computes, per (batch, query) program:
    z       = A_h @ src @ A_w^T          (bilinear upsample as two MXU
                                          matmuls; exact jax.image.resize
                                          semantics - criterion._resize_matrix)
    focal   = alpha_t * BCE(z, t) * (1 - p_t)^2    summed over pixels
    inter   = sum(sigmoid(z) * t),  psum = sum(sigmoid(z)),  tsum = sum(t)
entirely in VMEM: HBM traffic is one read of the logits + one read of the
uint8 GT mask per direction, plus a [BQ,128] output - no full-resolution
tensor ever touches HBM. The GT mask for each query is fetched by its
MATCHED gt index via scalar-prefetch DMA (no [B,NQ,H,W] gather
materialisation either). The backward kernel recomputes z and emits
d(src) = A_h^T @ dz @ A_w, wired up with jax.custom_vjp.

Numerics: matmuls run in bf16 with f32 accumulation (the 4x bilinear
weights {k/8} are exact in bf16), the elementwise chain in f32. Parity vs
the naive jnp formulation: tests/test_pallas_ops.py::TestFusedMaskLoss.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _resize_mats(h: int, w: int, gh: int, gw: int):
    from ..losses.criterion import _resize_matrix

    ah = jnp.asarray(_resize_matrix(h, gh), jnp.bfloat16)  # [gh, h]
    aw = jnp.asarray(_resize_matrix(w, gw), jnp.bfloat16)  # [gw, w]
    return ah, aw


def _elem_terms(z, t):
    # one shared transcendental pair (exp + log1p) for sigmoid AND the
    # stable BCE: e = exp(-|z|), sigmoid(z) = 1/(1+e) for z>=0 else e/(1+e)
    e = jnp.exp(-jnp.abs(z))
    r = 1.0 / (1.0 + e)
    prob = jnp.where(z >= 0, r, e * r)
    ce = jnp.maximum(z, 0.0) - z * t + jnp.log1p(e)
    p_t = prob * t + (1.0 - prob) * (1.0 - t)
    alpha_t = 0.25 * t + 0.75 * (1.0 - t)
    return prob, ce, p_t, alpha_t


def _upsample_in_kernel(src_ref, ah_ref, aw_ref):
    src = src_ref[0]  # [h, w] (input dtype)
    up = lax.dot_general(
        src.astype(jnp.bfloat16), aw_ref[...],
        (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32,
    )  # [h, gw]
    z = lax.dot_general(
        ah_ref[...], up.astype(jnp.bfloat16),
        (((1,), (0,)), ((), ())), preferred_element_type=jnp.float32,
    )  # [gh, gw] f32
    return z


def _fwd_kernel(idx_ref, src_ref, msk_ref, ah_ref, aw_ref, out_ref):
    # idx < 0 marks an UNMATCHED query: its loss contribution is masked to
    # zero by the caller anyway, so skip the upsample matmuls and the
    # transcendental-heavy focal chain entirely (typically 30-44 of the 50
    # queries per image - the dominant saving of this kernel at bs=16)
    valid = idx_ref[pl.program_id(0)] >= 0

    @pl.when(valid)
    def _compute():
        z = _upsample_in_kernel(src_ref, ah_ref, aw_ref)
        t = msk_ref[0].astype(jnp.int32).astype(jnp.float32)  # [gh, gw]
        prob, ce, p_t, alpha_t = _elem_terms(z, t)
        focal = alpha_t * ce * (1.0 - p_t) ** 2
        f_sum = jnp.sum(focal)
        inter = jnp.sum(prob * t)
        psum = jnp.sum(prob)
        tsum = jnp.sum(t)
        lane = lax.broadcasted_iota(jnp.int32, (1, 128), 1)
        vec = (
            jnp.where(lane == 0, f_sum, 0.0)
            + jnp.where(lane == 1, inter, 0.0)
            + jnp.where(lane == 2, psum, 0.0)
            + jnp.where(lane == 3, tsum, 0.0)
        )
        out_ref[0] = vec

    @pl.when(~valid)
    def _zero():
        out_ref[0] = jnp.zeros((1, 128), jnp.float32)


def _bwd_kernel(idx_ref, src_ref, msk_ref, ah_ref, aw_ref, g_ref, dsrc_ref):
    valid = idx_ref[pl.program_id(0)] >= 0

    @pl.when(valid)
    def _compute():
        z = _upsample_in_kernel(src_ref, ah_ref, aw_ref)
        t = msk_ref[0].astype(jnp.int32).astype(jnp.float32)
        gvec = g_ref[0]  # [1, 128] f32: lanes 0..2 = d/d(f_sum, inter, psum)
        lane = lax.broadcasted_iota(jnp.int32, (1, 128), 1)
        gf = jnp.sum(jnp.where(lane == 0, gvec, 0.0))
        gi = jnp.sum(jnp.where(lane == 1, gvec, 0.0))
        gp = jnp.sum(jnp.where(lane == 2, gvec, 0.0))

        prob, ce, p_t, alpha_t = _elem_terms(z, t)
        s = 1.0 - p_t
        pq = prob * (1.0 - prob)
        dfocal = alpha_t * (s * s * (prob - t) - 2.0 * s * (2.0 * t - 1.0) * pq * ce)
        dz = gf * dfocal + (gi * t + gp) * pq  # [gh, gw] f32

        down = lax.dot_general(
            dz.astype(jnp.bfloat16), aw_ref[...],
            (((1,), (0,)), ((), ())), preferred_element_type=jnp.float32,
        )  # [gh, w]
        dsrc = lax.dot_general(
            ah_ref[...], down.astype(jnp.bfloat16),
            (((0,), (0,)), ((), ())), preferred_element_type=jnp.float32,
        )  # [h, w]
        dsrc_ref[0] = dsrc.astype(dsrc_ref.dtype)

    @pl.when(~valid)
    def _zero():
        dsrc_ref[0] = jnp.zeros(dsrc_ref.shape[1:], dsrc_ref.dtype)


def _common_specs(nq: int, h: int, w: int, gh: int, gw: int):
    src_spec = pl.BlockSpec((1, h, w), lambda i, idx: (i, 0, 0),
                            memory_space=pltpu.VMEM)
    # idx < 0 encodes "unmatched" (kernel skips compute); clamp the DMA
    # index to a real block - consecutive unmatched programs then map to
    # the same block and the pipeline elides the redundant copies
    msk_spec = pl.BlockSpec((1, gh, gw),
                            lambda i, idx: (jnp.maximum(idx[i], 0), 0, 0),
                            memory_space=pltpu.VMEM)
    ah_spec = pl.BlockSpec((gh, h), lambda i, idx: (0, 0), memory_space=pltpu.VMEM)
    aw_spec = pl.BlockSpec((gw, w), lambda i, idx: (0, 0), memory_space=pltpu.VMEM)
    return src_spec, msk_spec, ah_spec, aw_spec


def _flatten_inputs(src_logits, gt_masks, tgt_idx, matched):
    b, nq, h, w = src_logits.shape
    ng = gt_masks.shape[1]
    gh, gw = gt_masks.shape[-2:]
    src_flat = src_logits.reshape(b * nq, h, w)
    msk_flat = gt_masks.reshape(b * ng, gh, gw)
    idx_flat = (
        jnp.arange(b, dtype=jnp.int32)[:, None] * ng
        + jnp.clip(tgt_idx.astype(jnp.int32), 0, ng - 1)
    ).reshape(b * nq)
    if matched is not None:
        idx_flat = jnp.where(matched.reshape(b * nq), idx_flat, -1)
    return src_flat, msk_flat, idx_flat, (b, nq, h, w, gh, gw)


@functools.partial(jax.custom_vjp, nondiff_argnums=(3,))
def fused_focal_dice(src_logits, gt_masks, tgt_idx, interpret=False,
                     matched=None):
    """Fused mask-loss sums. src_logits [B,NQ,h,w]; gt_masks [B,NG,gh,gw]
    uint8 (disjointness NOT required - each query reads its own mask);
    tgt_idx [B,NQ] int (clamped to [0,NG)). Returns four [B,NQ] f32 arrays:
    (focal_sum, inter, prob_sum, tgt_sum). Pixel means/dice are computed by
    the caller; unmatched queries must be masked by the caller (same
    contract as the naive path).

    matched [B,NQ] bool (optional, static-shaped): unmatched queries skip
    the upsample matmuls + focal chain inside the kernel and return exact
    zeros (the caller masks them anyway; the reference gathers matched-only,
    criterion.py:102-104). With the usual handful of GT planes per image
    this removes 60-90%% of the kernel's work. matched=None keeps the old
    compute-everything behaviour (all four sums valid at every lane)."""
    out, _ = _fwd(src_logits, gt_masks, tgt_idx, interpret, matched)
    return out


def _fwd(src_logits, gt_masks, tgt_idx, interpret, matched=None):
    src_flat, msk_flat, idx_flat, (b, nq, h, w, gh, gw) = _flatten_inputs(
        src_logits, gt_masks, tgt_idx, matched)
    ah, aw = _resize_mats(h, w, gh, gw)
    src_spec, msk_spec, ah_spec, aw_spec = _common_specs(nq, h, w, gh, gw)

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(b * nq,),
        in_specs=[src_spec, msk_spec, ah_spec, aw_spec],
        out_specs=pl.BlockSpec((1, 1, 128), lambda i, idx: (i, 0, 0),
                               memory_space=pltpu.VMEM),
    )
    out = pl.pallas_call(
        _fwd_kernel,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((b * nq, 1, 128), jnp.float32),
        interpret=interpret,
    )(idx_flat, src_flat, msk_flat, ah, aw)

    res = (src_logits, gt_masks, tgt_idx, matched)
    outs = tuple(out[:, 0, i].reshape(b, nq) for i in range(4))
    return outs, res


def _bwd(interpret, res, cots):
    src_logits, gt_masks, tgt_idx, matched = res
    g_f, g_i, g_p, _g_t = cots  # tgt_sum is independent of src
    src_flat, msk_flat, idx_flat, (b, nq, h, w, gh, gw) = _flatten_inputs(
        src_logits, gt_masks, tgt_idx, matched)
    ah, aw = _resize_mats(h, w, gh, gw)
    src_spec, msk_spec, ah_spec, aw_spec = _common_specs(nq, h, w, gh, gw)

    lane = jnp.arange(128)
    gvec = (
        jnp.where(lane == 0, g_f.reshape(-1, 1), 0.0)
        + jnp.where(lane == 1, g_i.reshape(-1, 1), 0.0)
        + jnp.where(lane == 2, g_p.reshape(-1, 1), 0.0)
    ).astype(jnp.float32)[:, None, :]  # [BQ, 1, 128]

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(b * nq,),
        in_specs=[src_spec, msk_spec, ah_spec, aw_spec,
                  pl.BlockSpec((1, 1, 128), lambda i, idx: (i, 0, 0),
                               memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec((1, h, w), lambda i, idx: (i, 0, 0),
                               memory_space=pltpu.VMEM),
    )
    dsrc = pl.pallas_call(
        _bwd_kernel,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((b * nq, h, w), src_logits.dtype),
        interpret=interpret,
    )(idx_flat, src_flat, msk_flat, ah, aw, gvec)

    dsrc = dsrc.reshape(src_logits.shape)
    d_masks = np.zeros(gt_masks.shape, jax.dtypes.float0)
    d_idx = np.zeros(tgt_idx.shape, jax.dtypes.float0)
    d_matched = (None if matched is None
                 else np.zeros(matched.shape, jax.dtypes.float0))
    return dsrc, d_masks, d_idx, d_matched


fused_focal_dice.defvjp(
    lambda src, masks, idx, interpret, matched=None: _fwd(
        src, masks, idx, interpret, matched),
    _bwd,
)


def focal_dice_reference(src_logits, gt_masks, tgt_idx):
    """Naive jnp twin (same math at full f32) for parity tests."""
    from ..losses.criterion import upsample_bilinear

    b, nq = src_logits.shape[:2]
    gh, gw = gt_masks.shape[-2:]
    ng = gt_masks.shape[1]
    idx = jnp.clip(tgt_idx.astype(jnp.int32), 0, ng - 1)
    tgt = jnp.take_along_axis(
        gt_masks, idx[:, :, None, None], axis=1).astype(jnp.float32)
    z = upsample_bilinear(src_logits.astype(jnp.float32), gh, gw)
    prob, ce, p_t, alpha_t = _elem_terms(z, tgt)
    focal = alpha_t * ce * (1.0 - p_t) ** 2
    return (
        jnp.sum(focal, axis=(2, 3)),
        jnp.sum(prob * tgt, axis=(2, 3)),
        jnp.sum(prob, axis=(2, 3)),
        jnp.sum(tgt, axis=(2, 3)),
    )
