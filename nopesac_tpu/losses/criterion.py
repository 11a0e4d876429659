"""Set-prediction criterion for plane detection (Hungarian match + losses).

Spec: modeling/criterion.py + modeling/matcher.py. Fixed-shape rewrite:
  * per-image Python loops become batched masked tensor ops;
  * scipy LSA on CPU becomes the on-device JV solver (losses/hungarian.py);
  * `match[b, q] in [0, NGT) or -1` encodes the permutation.

Targets layout (produced by the data pipeline, all fixed shape):
  gt_valid   [B, NG] bool      gt_masks   [B, NG, H, W] (0/1)
  gt_params  [B, NG, 3]        gt_centers [B, NG, 2]
  gt_pixel_centers [B, H, W, 2]
  depth      [B, H, W]         k_inv_dot_xy1 [B, 3, H, W]
"""
from __future__ import annotations

from typing import Dict

import jax
import jax.numpy as jnp

from functools import lru_cache

import numpy as np

from ..core.geometry import normalize, safe_norm
from .hungarian import hungarian_device


@lru_cache(maxsize=8)
def _resize_matrix(n_in: int, n_out: int):
    """Dense operator matrix of jax.image.resize(..., method='bilinear').

    Bilinear resize is a separable linear map, so upsampling [h,w]->[H,W] is
    two dense matmuls z = A_h @ x @ A_w^T that ride the MXU; XLA's native
    resize lowering (and especially its transpose in the backward pass) is
    bandwidth-bound instead. Exact for integer upsample ratios
    (tests/test_criterion.py::test_resize_matrix_matches_jax_image).
    """
    out = np.zeros((n_out, n_in), np.float64)
    scale = n_in / n_out
    for i in range(n_out):
        src = (i + 0.5) * scale - 0.5
        lo = int(np.floor(src))
        frac = src - lo
        lo_c = min(max(lo, 0), n_in - 1)
        hi_c = min(max(lo + 1, 0), n_in - 1)
        out[i, lo_c] += 1 - frac
        out[i, hi_c] += frac
    return out.astype(np.float32)


def upsample_bilinear(x: jnp.ndarray, gh: int, gw: int) -> jnp.ndarray:
    """[..., h, w] -> [..., gh, gw], bitwise jax.image.resize semantics."""
    h, w = x.shape[-2:]
    ah = jnp.asarray(_resize_matrix(h, gh), x.dtype)
    aw = jnp.asarray(_resize_matrix(w, gw), x.dtype)
    return jnp.einsum("Hh,...hw,Ww->...HW", ah, x, aw)


def mask_focal_dice(src, gt_masks, tgt_idx, use_pallas=None, matched=None):
    """Per-query focal mean + dice vs each query's matched GT mask.

    src: [B, NQ, h, w] mask logits; gt_masks: [B, NG, H, W] 0/1 (uint8);
    tgt_idx: [B, NQ] matched gt index (clamped >= 0; unmatched queries must
    be zeroed by the caller). Returns (focal_per [B,NQ], dice [B,NQ]) f32.

    matched: [B, NQ] bool (optional). On the Pallas path unmatched queries
    skip the kernel's upsample+focal work entirely and return zeros - the
    caller masks them regardless (the reference gathers matched-only,
    criterion.py:102-104), so only masked-out lanes change value.

    On TPU this dispatches to the fused Pallas kernel
    (ops/mask_loss_pallas.py) - no full-resolution [B,NQ,H,W] tensor ever
    reaches HBM; elsewhere it runs the naive upsample+elementwise chain
    (same algebra, tested against each other in tests/test_pallas_ops.py).

    Precision contract: the Pallas kernel runs the upsample matmuls in
    bfloat16 with f32 accumulation, in both the forward and the recomputed
    backward - with f32 inputs, TPU loss/gradients differ from the naive
    path at the bf16 rounding level (~3e-2 gradient parity; MXU-speed
    tradeoff, deliberate).
    """
    gh, gw = gt_masks.shape[-2:]
    if use_pallas is None:
        import os

        # criterion-only ablation override: NOPESAC_PALLAS_MASK_LOSS=0
        # forces the naive f32 upsample chain while every other Pallas
        # gate stays on — used for the bf16-upsample precision A/B
        # (PERF.md "mask-loss precision A/B")
        v = os.environ.get("NOPESAC_PALLAS_MASK_LOSS")
        if v is not None and v.strip() != "":
            use_pallas = v.strip().lower() not in ("0", "false", "off", "no")
        else:
            from ..utils.backend import pallas_ok
            use_pallas = pallas_ok()
    if use_pallas:
        from ..ops.mask_loss_pallas import fused_focal_dice

        f_sum, inter, psum, tsum = fused_focal_dice(
            src, gt_masks, tgt_idx, False, matched)
        focal_per = f_sum / (gh * gw)
        dice = 1.0 - (2.0 * inter + 1.0) / (psum + tsum + 1.0)
        if matched is not None:
            # unmatched lanes came back as exact zeros from the kernel ->
            # dice would read 1 - 1/1 = 0 already, but keep the naive-path
            # convention (caller multiplies by matched anyway)
            dice = dice * matched.astype(dice.dtype)
        return focal_per, dice

    src_up = upsample_bilinear(src, gh, gw)
    tgt = jnp.take_along_axis(
        gt_masks, tgt_idx[:, :, None, None], axis=1
    ).astype(src.dtype)  # [B, NQ, H, W]
    prob = jax.nn.sigmoid(src_up)
    ce = _bce_logits(src_up, tgt)
    p_t = prob * tgt + (1 - prob) * (1 - tgt)
    alpha_t = 0.25 * tgt + 0.75 * (1 - tgt)
    focal = alpha_t * ce * ((1 - p_t) ** 2)
    focal_per = jnp.mean(focal, axis=(2, 3)).astype(jnp.float32)
    inter = jnp.sum(prob * tgt, axis=(2, 3))
    denom = jnp.sum(prob, axis=(2, 3)) + jnp.sum(tgt, axis=(2, 3))
    dice = (1 - (2 * inter + 1) / (denom + 1)).astype(jnp.float32)
    return focal_per, dice


# ---------------------------------------------------------------------------
# pairwise costs (matcher.py:12-163)
# ---------------------------------------------------------------------------

def _bce_logits(x, target):
    # binary_cross_entropy_with_logits, elementwise
    return jnp.maximum(x, 0) - x * target + jnp.log1p(jnp.exp(-jnp.abs(x)))


def batch_sigmoid_focal_cost(inputs, targets, alpha=0.25, gamma=2.0):
    """[NQ, HW] x [NG, HW] -> [NQ, NG] focal cost (matcher.py:30-63)."""
    hw = inputs.shape[-1]
    prob = jax.nn.sigmoid(inputs)
    focal_pos = ((1 - prob) ** gamma) * _bce_logits(inputs, jnp.ones_like(inputs)) * alpha
    focal_neg = (prob ** gamma) * _bce_logits(inputs, jnp.zeros_like(inputs)) * (1 - alpha)
    loss = jnp.einsum("nc,mc->nm", focal_pos, targets) + jnp.einsum(
        "nc,mc->nm", focal_neg, 1 - targets
    )
    return loss / hw


def batch_dice_cost(inputs, targets):
    """[NQ, HW] x [NG, HW] -> [NQ, NG] dice cost (matcher.py:12-27)."""
    inputs = jax.nn.sigmoid(inputs)
    numerator = 2 * jnp.einsum("nc,mc->nm", inputs, targets)
    denominator = inputs.sum(-1)[:, None] + targets.sum(-1)[None, :]
    return 1 - (numerator + 1) / (denominator + 1)


def compute_match_cost(outputs: Dict, targets: Dict, weights: Dict) -> jnp.ndarray:
    """Per-image DETR matching cost matrix [B, NQ, NG] (matcher.py:104-163)."""
    logits = outputs["pred_logits"]  # [B, NQ, 2]
    b, nq, _ = logits.shape
    mask_logits = outputs["pred_mask_logits"]  # [B, NQ, h, w]
    h, w = mask_logits.shape[-2:]

    out_prob = jax.nn.softmax(logits, axis=-1)
    cost_class = -out_prob[..., 0:1]  # [B, NQ, 1] (all targets are class 0)

    # GT masks downsampled (nearest) to prediction resolution (matcher.py:117)
    gt_masks = targets["gt_masks"]
    gh, gw = gt_masks.shape[-2:]
    ys = (jnp.arange(h) * (gh / h)).astype(jnp.int32)
    xs = (jnp.arange(w) * (gw / w)).astype(jnp.int32)
    tgt_small = gt_masks[:, :, ys][:, :, :, xs].astype(mask_logits.dtype)  # [B, NG, h, w]

    src_flat = mask_logits.reshape(b, nq, h * w)
    tgt_flat = tgt_small.reshape(b, tgt_small.shape[1], h * w)
    cost_mask = jax.vmap(batch_sigmoid_focal_cost)(src_flat, tgt_flat)
    cost_dice = jax.vmap(batch_dice_cost)(src_flat, tgt_flat)

    out_center = outputs["pred_centers"]  # [B, NQ, 2]
    tgt_center = targets["gt_centers"]  # [B, NG, 2]
    cost_center = jnp.linalg.norm(out_center[:, :, None] - tgt_center[:, None], axis=-1)

    out_param = outputs["pred_params"]
    tgt_param = targets["gt_params"]
    cost_param = jnp.sum(jnp.abs(out_param[:, :, None] - tgt_param[:, None]), axis=-1)

    out_n = normalize(out_param)
    tgt_n = normalize(tgt_param)
    cosv = jnp.clip(jnp.einsum("bqc,bgc->bqg", out_n, tgt_n), -0.999999, 0.999999)
    cost_angle = jnp.rad2deg(jnp.arccos(cosv))

    out_off = jnp.linalg.norm(out_param, axis=-1)
    tgt_off = jnp.linalg.norm(tgt_param, axis=-1)
    cost_offset = jnp.abs(out_off[:, :, None] - tgt_off[:, None])

    c = (
        weights["cost_mask"] * cost_mask
        + weights["cost_class"] * cost_class
        + weights["cost_dice"] * cost_dice
        + weights["cost_center"] * cost_center
        + weights["cost_param"] * cost_param
        + weights["cost_param_offset"] * cost_offset
        + weights["cost_param_normal_angle"] * cost_angle
    )
    return c


def match_planes(outputs: Dict, targets: Dict, weights: Dict) -> jnp.ndarray:
    """Hungarian matching -> match [B, NQ] (gt index or -1)."""
    return match_planes_multi([outputs], targets, weights)[0]


def match_planes_multi(outputs_list, targets: Dict, weights: Dict):
    """Hungarian matching for several supervision levels in ONE solver call.

    The reference matches each deep-supervision level independently
    (criterion.py:302-308) - same algorithm, same targets, different
    predictions. The JV solver is a sequential lax.while_loop whose
    per-iteration work is tiny, so its cost on TPU is iteration *overhead*,
    not FLOPs: stacking all L levels into one [L*B, NQ, NG] batch runs the
    same sequential depth once instead of L times (~3x fewer while-loop
    dispatches for the standard 3-level supervision). Exact - each batch
    entry is still an independent LSA.

    Returns a list of match arrays [B, NQ] (gt index or -1), one per level.
    """
    levels = len(outputs_list)
    costs = [compute_match_cost(o, targets, weights) for o in outputs_list]
    cost = jnp.concatenate(costs, axis=0)  # [L*B, NQ, NG]
    num_gt = jnp.sum(targets["gt_valid"].astype(jnp.int32), axis=-1)  # [B]
    num_gt = jnp.tile(num_gt, levels)
    lb, nq, ng = cost.shape
    if ng < nq:
        cost = jnp.pad(cost, ((0, 0), (0, 0), (0, nq - ng)), constant_values=0.0)
    cost = jax.lax.stop_gradient(cost)
    match = hungarian_device(cost, num_gt)
    return list(jnp.split(match, levels, axis=0))


# ---------------------------------------------------------------------------
# losses (criterion.py:75-245)
# ---------------------------------------------------------------------------

def detection_losses(
    outputs: Dict,
    targets: Dict,
    match: jnp.ndarray,  # [B, NQ]
    num_masks: jnp.ndarray,  # scalar: global mean GT count (already psum'd)
    eos_coef: float = 0.1,
    aux: bool = False,
    center_on: bool = True,
    param_on: bool = True,
) -> Dict[str, jnp.ndarray]:
    losses = {}
    logits = outputs["pred_logits"]  # [B, NQ, C+1]
    b, nq, nc1 = logits.shape
    matched = match >= 0  # [B, NQ]
    tgt_idx = jnp.maximum(match, 0)  # [B, NQ]
    matched_f = matched.astype(logits.dtype)
    num_matched_total = jnp.maximum(jnp.sum(matched_f), 1.0)

    # ---- labels: weighted CE with no-object weight (criterion.py:75-91)
    target_classes = jnp.where(matched, 0, nc1 - 1)  # [B, NQ]
    logp = jax.nn.log_softmax(logits, axis=-1)
    nll = -jnp.take_along_axis(logp, target_classes[..., None], axis=-1)[..., 0]
    class_w = jnp.where(matched, 1.0, eos_coef)
    # torch weighted CE 'mean' divides by the sum of applied weights
    losses["loss_ce"] = jnp.sum(nll * class_w) / jnp.sum(class_w)

    # ---- masks: focal + dice on matched pairs (criterion.py:93-120)
    gt_masks = targets["gt_masks"]  # [B, NG, H, W]
    gh, gw = gt_masks.shape[-2:]
    src = outputs["pred_mask_logits"]  # [B, NQ, h, w]
    matched_f32 = matched_f.astype(jnp.float32)
    focal_per, dice = mask_focal_dice(src, gt_masks, tgt_idx, matched=matched)
    losses["loss_mask"] = jnp.sum(focal_per * matched_f32) / num_masks
    losses["loss_dice"] = jnp.sum(dice * matched_f32) / num_masks

    # ---- centers (criterion.py:122-153)
    if center_on and "pred_centers" in outputs:
        src_c = outputs["pred_centers"]  # [B, NQ, 2]
        tgt_c = jnp.take_along_axis(targets["gt_centers"], tgt_idx[..., None], axis=1)
        dist = safe_norm(tgt_c - src_c, axis=-1)
        losses["loss_center_ins"] = jnp.sum(dist * matched_f) / num_matched_total
        if not aux and "pixel_centers" in outputs:
            pc = outputs["pixel_centers"]  # [B, h, w, 2]
            pc = jax.image.resize(pc, (b, gh, gw, 2), method="bilinear")
            gt_pc = targets["gt_pixel_centers"]  # [B, H, W, 2]
            pd = safe_norm(jnp.abs(gt_pc - pc), axis=-1)
            losses["loss_center_pixel"] = jnp.mean(pd)

    # ---- params: L1 + cos (+ Q on the final level) (criterion.py:155-234)
    if param_on and "pred_params" in outputs:
        src_p = outputs["pred_params"]
        tgt_p = jnp.take_along_axis(targets["gt_params"], tgt_idx[..., None], axis=1)
        l1 = jnp.sum(jnp.abs(tgt_p - src_p), axis=-1)
        losses["loss_param_l1"] = jnp.sum(l1 * matched_f) / num_matched_total

        def _cos(a, b_):
            na = safe_norm(a, axis=-1)
            nb = safe_norm(b_, axis=-1)
            return jnp.sum(a * b_, axis=-1) / jnp.maximum(na * nb, 1e-8)

        cos = 1 - _cos(src_p, tgt_p)
        losses["loss_param_cos"] = jnp.sum(cos * matched_f) / num_matched_total

        if not aux:
            losses["loss_q"] = _q_loss_segmap(src_p, match, targets)

    return losses


def _q_params_new(p):
    """normal/offset^2 rescale shared by both Q-loss implementations
    (criterion.py:183-189): n/d where n = p/|p|, d = |p|."""
    off = safe_norm(p, axis=-1, keepdims=True)
    nrm = p / jnp.maximum(off, 1e-12)
    return nrm / jnp.maximum(off, 1e-12)


def _q_loss(src_p, tgt_p, tgt_masks, matched_f, targets):
    """Point-to-plane depth consistency (criterion.py:173-233).

    src_p/tgt_p: [B, NQ, 3] matched params; tgt_masks: [B, NQ, H, W];
    matched_f: [B, NQ]. Per image: valid_region = (gt err map < 0.2) & covered,
    loss = mean over valid_region of sum_n |pred_n . X - 1| * mask_n.
    """
    depth = targets["depth"]  # [B, H, W]
    kxy = targets["k_inv_dot_xy1"]  # [B, 3, H, W]
    pts = kxy * depth[:, None]  # [B, 3, H, W]

    gt_new = _q_params_new(tgt_p) * matched_f[..., None]
    pr_new = _q_params_new(src_p) * matched_f[..., None]
    masks = tgt_masks * matched_f[..., None, None]

    gt_dist = jnp.abs(jnp.einsum("bnc,bchw->bnhw", gt_new, pts) - 1.0) * masks
    gt_err_map = jnp.sum(gt_dist, axis=1)  # [B, H, W]
    covered = jnp.sum(masks, axis=1) > 0
    valid_region = (gt_err_map < 0.2) & covered  # [B, H, W]

    pr_dist = jnp.abs(jnp.einsum("bnc,bchw->bnhw", pr_new, pts) - 1.0) * masks
    pr_err_map = jnp.sum(pr_dist, axis=1)

    vr_f = valid_region.astype(pr_err_map.dtype)
    per_img_sum = jnp.sum(pr_err_map * vr_f, axis=(1, 2))
    per_img_cnt = jnp.sum(vr_f, axis=(1, 2))
    has_masks = jnp.sum(masks, axis=(1, 2, 3)) >= 1
    ok = has_masks & (per_img_cnt > 0)
    per_img = jnp.where(ok, per_img_sum / jnp.maximum(per_img_cnt, 1.0), 0.0)
    return jnp.mean(per_img)


def _q_loss_segmap(src_p, match, targets):
    """Exact Q-loss rewrite via a per-pixel GT-index map (criterion.py:173-233).

    The naive formulation materialises two [B, NQ, H, W] plane-distance
    volumes (sum_n |p_n . X - 1| * mask_n). GT instance masks are DISJOINT
    (MP3D: semantic-map equality, mapper.py:138; ScanNet: pre-rendered seg),
    so per pixel at most one matched query's mask is active and the sum
    collapses to a single gathered term: build seg[b,h,w] = argmax_g mask_g,
    gather that GT's (and its matched prediction's) rescaled params per
    pixel, and evaluate |p . X - 1| once per pixel - [B, H, W] work instead
    of [B, NQ, H, W] (50x less HBM traffic). Bitwise-equal to _q_loss on
    disjoint masks (tests/test_criterion.py::TestQLossSegmap).

    The per-pixel lookup is NOT a gather: TPU gathers with per-element
    dynamic indices serialise (measured 30x slower than the naive loss).
    Disjoint 0/1 masks ARE the one-hot encoding of the pixel->plane map, so
    the lookup is a single MXU matmul einsum("bnhw,bnc->bchw", masks, params)
    that reads the mask volume once per direction.

    src_p: [B, NQ, 3] predicted params; match: [B, NQ] gt index or -1.
    """
    gt_masks = targets["gt_masks"]  # [B, NG, H, W], disjoint 0/1
    b, ng = gt_masks.shape[:2]
    nq = src_p.shape[1]
    depth = targets["depth"]  # [B, H, W]
    kxy = targets["k_inv_dot_xy1"]  # [B, 3, H, W]
    pts = kxy * depth[:, None]  # [B, 3, H, W]

    # inverse permutation: inv[b, g] = query matched to gt g, or -1
    q_idx = jnp.arange(nq, dtype=jnp.int32)
    inv = jnp.full((b, ng), -1, jnp.int32)
    inv = inv.at[jnp.arange(b)[:, None], jnp.maximum(match, 0)].max(
        jnp.where(match >= 0, q_idx[None], -1))
    active_g = (inv >= 0).astype(jnp.float32)  # [B, NG]

    gt_new_g = _q_params_new(targets["gt_params"]) * active_g[..., None]  # [B, NG, 3]
    pr_new_q = _q_params_new(src_p)  # [B, NQ, 3]
    pr_new_g = jnp.take_along_axis(
        pr_new_q, jnp.maximum(inv, 0)[..., None], axis=1) * active_g[..., None]

    # one-hot matmul: per-pixel [gt params | pred params | matched-coverage]
    stack = jnp.concatenate(
        [gt_new_g, pr_new_g, active_g[..., None]], axis=-1)  # [B, NG, 7]
    masks_f = gt_masks.astype(jnp.float32)
    px = jnp.einsum("bnhw,bnc->bchw", masks_f, stack)  # [B, 7, H, W]
    gt_px, pr_px, act_f = px[:, 0:3], px[:, 3:6], px[:, 6]
    act_px = act_f > 0

    gt_err_map = jnp.abs(jnp.sum(gt_px * pts, axis=1) - 1.0) * act_f
    valid_region = (gt_err_map < 0.2) & act_px
    pr_err_map = jnp.abs(jnp.sum(pr_px * pts, axis=1) - 1.0) * act_f

    vr_f = valid_region.astype(pr_err_map.dtype)
    per_img_sum = jnp.sum(pr_err_map * vr_f, axis=(1, 2))
    per_img_cnt = jnp.sum(vr_f, axis=(1, 2))
    has_masks = jnp.sum(act_f, axis=(1, 2)) >= 1
    ok = has_masks & (per_img_cnt > 0)
    per_img = jnp.where(ok, per_img_sum / jnp.maximum(per_img_cnt, 1.0), 0.0)
    return jnp.mean(per_img)


def depth_loss(outputs, targets):
    """Masked L1 depth loss (criterion.py:236-245)."""
    gt = targets["depth"]  # [B, H, W]
    pred = outputs["pixel_depth"][..., 0]  # [B, h, w]
    pred = jax.image.resize(pred, gt.shape, method="bilinear")
    mask = (gt > 1e-4).astype(pred.dtype)
    return jnp.sum(jnp.abs(pred - gt) * mask) / jnp.maximum(jnp.sum(mask), 1.0)


def depth_loss_siamese(outputs, targets):
    """Per-view masked L1 depth, averaged (reference computes per view)."""
    gt = targets["depth"]  # [2B, H, W]
    b2 = gt.shape[0]
    pred = outputs["pixel_depth"][..., 0]
    pred = jax.image.resize(pred, gt.shape, method="bilinear")
    mask = (gt > 1e-4).astype(pred.dtype)
    err = (jnp.abs(pred - gt) * mask).reshape(2, b2 // 2, -1).sum(axis=(1, 2))
    cnt = jnp.maximum(mask.reshape(2, b2 // 2, -1).sum(axis=(1, 2)), 1.0)
    return jnp.mean(err / cnt)


# ---------------------------------------------------------------------------
# siamese (two views concatenated along batch) variant
# ---------------------------------------------------------------------------

def detection_losses_siamese(
    outputs: Dict,
    targets: Dict,
    match: jnp.ndarray,  # [2B, NQ]
    eos_coef: float = 0.1,
    aux: bool = False,
    center_on: bool = True,
    param_on: bool = True,
) -> Dict[str, jnp.ndarray]:
    """Both views run as ONE 2B batch (view0 = first half), with per-view
    loss normalisation then averaging, exactly matching the reference's
    per-view criterion calls + (l0+l1)/2 (siamese_planeTR.py:233-235).

    One traced graph instead of two - halves the XLA compile cost of the
    detection loss and doubles the matmul batch on the MXU.
    """
    losses = {}
    logits = outputs["pred_logits"]  # [2B, NQ, C+1]
    b2, nq, nc1 = logits.shape
    b = b2 // 2
    matched = match >= 0
    tgt_idx = jnp.maximum(match, 0)
    matched_f = matched.astype(logits.dtype)

    def per_view_sum(x):  # [2B, ...] -> [2]
        return jnp.sum(x.reshape(2, b, -1), axis=(1, 2))

    # per-view normalisers (criterion.py:287-294; clamp >= 1)
    num_masks_v = jnp.maximum(per_view_sum(targets["gt_valid"].astype(jnp.float32)), 1.0)
    num_matched_v = jnp.maximum(per_view_sum(matched_f), 1.0)

    # ---- labels
    target_classes = jnp.where(matched, 0, nc1 - 1)
    logp = jax.nn.log_softmax(logits, axis=-1)
    nll = -jnp.take_along_axis(logp, target_classes[..., None], axis=-1)[..., 0]
    class_w = jnp.where(matched, 1.0, eos_coef)
    ce_v = per_view_sum(nll * class_w) / per_view_sum(class_w)
    losses["loss_ce"] = jnp.mean(ce_v)

    # ---- masks
    gt_masks = targets["gt_masks"]
    gh, gw = gt_masks.shape[-2:]
    src = outputs["pred_mask_logits"]
    matched_f32 = matched_f.astype(jnp.float32)
    focal_per, dice = mask_focal_dice(src, gt_masks, tgt_idx, matched=matched)
    losses["loss_mask"] = jnp.mean(per_view_sum(focal_per * matched_f32) / num_masks_v)
    losses["loss_dice"] = jnp.mean(per_view_sum(dice * matched_f32) / num_masks_v)

    # ---- centers
    if center_on and "pred_centers" in outputs:
        src_c = outputs["pred_centers"]
        tgt_c = jnp.take_along_axis(targets["gt_centers"], tgt_idx[..., None], axis=1)
        dist = safe_norm(tgt_c - src_c, axis=-1)
        losses["loss_center_ins"] = jnp.mean(per_view_sum(dist * matched_f) / num_matched_v)
        if not aux and "pixel_centers" in outputs:
            pc = outputs["pixel_centers"]
            pc = jax.image.resize(pc, (b2, gh, gw, 2), method="bilinear")
            pd = safe_norm(jnp.abs(targets["gt_pixel_centers"] - pc), axis=-1)
            losses["loss_center_pixel"] = jnp.mean(pd)

    # ---- params
    if param_on and "pred_params" in outputs:
        src_p = outputs["pred_params"]
        tgt_p = jnp.take_along_axis(targets["gt_params"], tgt_idx[..., None], axis=1)
        l1 = jnp.sum(jnp.abs(tgt_p - src_p), axis=-1)
        losses["loss_param_l1"] = jnp.mean(per_view_sum(l1 * matched_f) / num_matched_v)

        na = safe_norm(src_p, axis=-1)
        nb = safe_norm(tgt_p, axis=-1)
        cos = 1 - jnp.sum(src_p * tgt_p, axis=-1) / jnp.maximum(na * nb, 1e-8)
        losses["loss_param_cos"] = jnp.mean(per_view_sum(cos * matched_f) / num_matched_v)

        if not aux:
            losses["loss_q"] = _q_loss_segmap(src_p, match, targets)

    return losses
