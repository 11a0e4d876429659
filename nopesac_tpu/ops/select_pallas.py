"""Pallas TPU kernel: fused mask upsample + per-pixel argmax + plane stats.

The inference postprocess (reference: siamese_planeTR.py:625-803) upsamples
per-query mask probabilities [B, NQ, h, w] -> [B, NQ, H, W] (bilinear, 4x),
takes a per-pixel argmax over queries, gates by probability thresholds and
reduces per-query areas/centroids. Done naively (see the XLA reference
implementation below) this materialises several [B, 50, 480, 640] tensors in
HBM (~1 GB each at bs=16) and is purely bandwidth-bound (~4.3 ms/step
measured on v5e).

This kernel never materialises the full-resolution per-query maps: for the
integer upsample ratios the model uses (4x), each output *phase* (dy, dx)
is an exact 2-tap x 2-tap combination of shifted low-res maps (plain f32
VPU mul/adds — deliberately no MXU, whose default-precision matmul loses
~5e-3 and flips threshold/argmax decisions). The kernel loops queries with
the low-res input resident in VMEM and writes only phase-layout argmax/max
maps plus per-query statistics (~50x less HBM traffic); one cheap XLA
transpose de-interleaves the phases. Numerically identical to
jax.image.resize(..., "bilinear") half-pixel semantics (edge clamping folds
out-of-range taps into the border row/col, matching the normalised
triangle weights).

Outputs (everything select_planes needs downstream):
  seg_ids    [B, H, W] i32  — argmax_q of (valid ? score_q * up(prob_q) : -1)
  max_scaled [B, H, W] f32  — the corresponding max value
  stats      [B, 7, NQ] f32 — per query:
      0 cnt_gate    |{seg==q & max>thr}|          (gated mask area)
      1 sumx_gate   sum of x/W over that mask     (for centroids)
      2 sumy_gate   sum of y/H over that mask
      3 cnt_nogate  |{seg==q}|                    (ungated fallback mask)
      4 sumx_nogate
      5 sumy_nogate
      6 orig_count  |{up(prob_q) >= thr}|         (full per-query map count)
"""
from __future__ import annotations

import functools

import numpy as np

import jax
import jax.numpy as jnp
from jax import lax
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

STAT_NAMES = ("cnt_gate", "sumx_gate", "sumy_gate",
              "cnt_nogate", "sumx_nogate", "sumy_nogate", "orig_count")
_NSTAT = len(STAT_NAMES)


def _round_up(x: int, m: int) -> int:
    return ((x + m - 1) // m) * m


def build_resize_matrix(out_size: int, in_size: int) -> np.ndarray:
    """[out, in] bilinear (triangle kernel, half-pixel centres) interpolation
    matrix; U @ x == jax.image.resize(x, ..., "bilinear") along one axis."""
    o = np.arange(out_size, dtype=np.float64)
    s = (o + 0.5) * (in_size / out_size) - 0.5
    i = np.arange(in_size, dtype=np.float64)
    w = np.maximum(0.0, 1.0 - np.abs(s[:, None] - i[None, :]))
    w = w / np.maximum(w.sum(axis=1, keepdims=True), 1e-12)
    return w.astype(np.float32)


def _phase_taps(scale: int):
    """Per-phase 2-tap bilinear weights for an integer upsample.

    Output index o = scale*i + d samples input coordinate
    s = i + (d+0.5)/scale - 0.5. Returns, per phase d: (use_prev, w_near,
    w_far) — taps are rows (i-1, i) when the offset is negative (edge
    clamping folds the out-of-range tap into row 0/last, exactly matching
    the normalised triangle weights of jax.image.resize)."""
    taps = []
    for d in range(scale):
        off = (d + 0.5) / scale - 0.5
        if off < 0:
            taps.append((True, 1.0 + off, -off))    # w(i), w(i-1)
        else:
            taps.append((False, 1.0 - off, off))    # w(i), w(i+1)
    return taps


def _shift_prev(a):  # a[i] <- x[i-1], edge-replicated, along axis 0
    return jnp.concatenate([a[:1], a[:-1]], axis=0)


def _shift_next(a):  # a[i] <- x[i+1], edge-replicated, along axis 0
    return jnp.concatenate([a[1:], a[-1:]], axis=0)


def _shift_prev_c(a):  # along axis 1 (lanes)
    return jnp.concatenate([a[:, :1], a[:, :-1]], axis=1)


def _shift_next_c(a):
    return jnp.concatenate([a[:, 1:], a[:, -1:]], axis=1)


def _kernel(score_ref, valid_ref, x_ref, seg_ref, max_ref, stats_ref,
            *, nq: int, h: int, w: int, sh: int, sw: int, thr: float):
    """Per batch item: phase-decomposed bilinear upsample + argmax + stats.

    All arithmetic is plain f32 VPU mul/add (exact bilinear; no MXU, so no
    precision-lowered matmul). Outputs are in phase layout
    [sh*sw, h, w]; the caller de-interleaves with one XLA transpose."""
    row_taps = _phase_taps(sh)
    col_taps = _phase_taps(sw)
    out_w = sw * w
    out_h = sh * h
    nqp = stats_ref.shape[2]
    lane_q = lax.broadcasted_iota(jnp.int32, (1, nqp), 1)

    col_i = lax.broadcasted_iota(jnp.int32, (h, w), 1).astype(jnp.float32)
    row_i = lax.broadcasted_iota(jnp.int32, (h, w), 0).astype(jnp.float32)

    st = jnp.zeros((_NSTAT, nqp), jnp.float32)

    for dy, (r_prev, wr0, wr1) in enumerate(row_taps):

        def body1(q, carry, r_prev=r_prev, wr0=wr0, wr1=wr1):
            mxs, ams, st = carry
            xq = x_ref[0, q].astype(jnp.float32)  # [h, w]
            xo = _shift_prev(xq) if r_prev else _shift_next(xq)
            r = wr0 * xq + wr1 * xo               # row-interpolated [h, w]
            s = score_ref[0, 0, q]
            v = valid_ref[0, 0, q]
            # invalid queries score a constant -1 (select-free: y*sm + cm)
            vf = (v > 0).astype(jnp.float32)
            sm = s * vf
            cm = vf - 1.0
            oc_acc = jnp.zeros_like(r)
            new_mxs, new_ams = [], []
            ro_prev = _shift_prev_c(r)
            ro_next = _shift_next_c(r)
            for dx, (c_prev, wc0, wc1) in enumerate(col_taps):
                ro = ro_prev if c_prev else ro_next
                y = wc0 * r + wc1 * ro
                oc_acc = oc_acc + (y >= thr).astype(jnp.float32)
                gated = y * sm + cm
                upd = gated > mxs[dx]
                new_mxs.append(jnp.where(upd, gated, mxs[dx]))
                new_ams.append(jnp.where(upd, q, ams[dx]))
            # stats[6, q] += sum(oc_acc)  (Mosaic has no scatter-add:
            # accumulate via an [NSTAT,1] x [1,nqp] outer product instead)
            oc_col = jnp.concatenate(
                [jnp.zeros((6, 1), jnp.float32),
                 jnp.sum(oc_acc).reshape(1, 1)], axis=0)
            st = st + oc_col * (lane_q == q).astype(jnp.float32)
            return tuple(new_mxs), tuple(new_ams), st

        mx0 = tuple(jnp.full((h, w), -2.0, jnp.float32) for _ in range(sw))
        am0 = tuple(jnp.zeros((h, w), jnp.int32) for _ in range(sw))
        mxs, ams, st = lax.fori_loop(0, nq, body1, (mx0, am0, st))

        for dx in range(sw):
            seg_ref[0, dy * sw + dx] = ams[dx]
            max_ref[0, dy * sw + dx] = mxs[dx]

        # per-query area/centroid stats over this row-phase's pixels
        # (full-map reduces; a row/col-separable variant measured SLOWER in
        # Mosaic — skinny-array lane reductions cost more than they save)
        ys = (row_i * sh + dy) * (1.0 / out_h)
        gates = tuple((mxs[dx] > thr).astype(jnp.float32) for dx in range(sw))

        def body2(q, st, mxs=mxs, ams=ams, gates=gates, ys=ys):
            vals = jnp.zeros((6, 1), jnp.float32)
            for dx in range(sw):
                xs = (col_i * sw + dx) * (1.0 / out_w)
                m_n = (ams[dx] == q).astype(jnp.float32)
                m_g = m_n * gates[dx]
                vals = vals + jnp.concatenate([
                    jnp.sum(m_g).reshape(1, 1),
                    jnp.sum(m_g * xs).reshape(1, 1),
                    jnp.sum(m_g * ys).reshape(1, 1),
                    jnp.sum(m_n).reshape(1, 1),
                    jnp.sum(m_n * xs).reshape(1, 1),
                    jnp.sum(m_n * ys).reshape(1, 1),
                ], axis=0)
            vals_col = jnp.concatenate(
                [vals, jnp.zeros((1, 1), jnp.float32)], axis=0)  # oc row
            st = st + vals_col * (lane_q == q).astype(jnp.float32)
            return st

        st = lax.fori_loop(0, nq, body2, st)

    stats_ref[0] = st


def _fused_select_maps_pallas(mask_prob, score, valid, thr: float,
                              out_h: int, out_w: int, interpret: bool = False):
    b, nq, h, w = mask_prob.shape
    if out_h % h or out_w % w:
        raise ValueError(
            f"pallas path needs integer upsample ratios, got {h}x{w} -> "
            f"{out_h}x{out_w}; use the XLA path")
    sh, sw = out_h // h, out_w // w
    nqp = _round_up(nq, 128)
    nph = sh * sw

    x = mask_prob.astype(jnp.bfloat16)
    # SMEM blocks must have their last two dims equal to (or tile) the
    # array dims -> carry scores/valids as [b, 1, nqp]
    score_p = jnp.zeros((b, 1, nqp), jnp.float32).at[:, 0, :nq].set(
        score.astype(jnp.float32))
    valid_p = jnp.zeros((b, 1, nqp), jnp.int32).at[:, 0, :nq].set(
        valid.astype(jnp.int32))

    kernel = functools.partial(
        _kernel, nq=nq, h=h, w=w, sh=sh, sw=sw, thr=float(thr))

    seg_ph, mx_ph, stats = pl.pallas_call(
        kernel,
        grid=(b,),
        in_specs=[
            pl.BlockSpec((1, 1, nqp), lambda i: (i, 0, 0),
                         memory_space=pltpu.SMEM),
            pl.BlockSpec((1, 1, nqp), lambda i: (i, 0, 0),
                         memory_space=pltpu.SMEM),
            pl.BlockSpec((1, nq, h, w), lambda i: (i, 0, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((1, nph, h, w), lambda i: (i, 0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, nph, h, w), lambda i: (i, 0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, _NSTAT, nqp), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((b, nph, h, w), jnp.int32),
            jax.ShapeDtypeStruct((b, nph, h, w), jnp.float32),
            jax.ShapeDtypeStruct((b, _NSTAT, nqp), jnp.float32),
        ],
        interpret=interpret,
    )(score_p, valid_p, x)

    # de-interleave phases: full[:, sh*i+dy, sw*j+dx] = ph[:, dy*sw+dx, i, j]
    def deinterleave(ph):
        ph = ph.reshape(b, sh, sw, h, w)
        return ph.transpose(0, 3, 1, 4, 2).reshape(b, out_h, out_w)

    return deinterleave(seg_ph), deinterleave(mx_ph), stats[:, :, :nq]


def _fused_select_maps_xla(mask_prob, score, valid, thr: float,
                           out_h: int, out_w: int):
    """Reference implementation materialising the full [B, NQ, H, W] maps
    (this is what the kernel replaces; kept for CPU tests and as the oracle)."""
    b, nq, h, w = mask_prob.shape
    f32 = jnp.float32
    up = jax.image.resize(mask_prob.astype(f32), (b, nq, out_h, out_w),
                          method="bilinear")
    scaled = up * score.astype(f32)[:, :, None, None]
    gated = jnp.where(valid[:, :, None, None], scaled, -1.0)
    seg = jnp.argmax(gated, axis=1).astype(jnp.int32)
    mx = jnp.max(gated, axis=1)

    q_ids = jnp.arange(nq, dtype=jnp.int32)[None, :, None, None]
    m_n = (seg[:, None] == q_ids)
    m_g = m_n & (mx[:, None] > thr)
    xs = (jnp.arange(out_w, dtype=f32) / out_w)[None, None, None, :]
    ys = (jnp.arange(out_h, dtype=f32) / out_h)[None, None, :, None]

    def sums(m):
        mf = m.astype(f32)
        return (jnp.sum(mf, axis=(2, 3)),
                jnp.sum(mf * xs, axis=(2, 3)),
                jnp.sum(mf * ys, axis=(2, 3)))

    cg, sxg, syg = sums(m_g)
    cn, sxn, syn = sums(m_n)
    oc = jnp.sum((up >= thr).astype(f32), axis=(2, 3))
    stats = jnp.stack([cg, sxg, syg, cn, sxn, syn, oc], axis=1)
    return seg, mx, stats


def fused_select_maps(mask_prob, score, valid, thr: float,
                      out_h: int, out_w: int,
                      use_pallas: bool | None = None,
                      interpret: bool = False):
    """seg_ids [B,H,W] i32, max_scaled [B,H,W] f32, stats [B,7,NQ] f32.

    `use_pallas=None` picks the Pallas kernel on TPU, XLA elsewhere. The
    Pallas kernel reads the probabilities in bfloat16 (VMEM economy), so the
    probabilities are rounded to bfloat16 up front on BOTH paths - threshold
    and argmax decisions near the boundary are then backend-independent.
    """
    mask_prob = mask_prob.astype(jnp.bfloat16).astype(jnp.float32)
    if use_pallas is None:
        from ..utils.backend import pallas_ok
        use_pallas = pallas_ok()
    if use_pallas:
        return _fused_select_maps_pallas(mask_prob, score, valid, thr,
                                         out_h, out_w, interpret=interpret)
    return _fused_select_maps_xla(mask_prob, score, valid, thr, out_h, out_w)
