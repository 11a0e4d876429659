"""Camera pose losses + NOPE-SAC refinement losses.

Specs: camera_modules.py:355-379 (CameraPoseLoss), camera_head.py:882-921
(refinement loss zoo), camera_head.py:685-735 (AIM auto-encoder losses),
camera_modules.py:104-118 (random pose generation for AIM).
"""
from __future__ import annotations

from typing import Dict

import jax
import jax.numpy as jnp

from ..core.geometry import canonicalize_quat_sign, normalize, quat_from_rotvec, safe_norm


def camera_pose_loss(est_tran, est_rot, gt_pose):
    """(mean ||dt||, mean ||normalize(q)-normalize(q_gt)||) — camera_modules.py:360-367.

    The estimate-side normalize uses eps=1e-3 instead of torch's 1e-12:
    values are identical whenever |est_rot| > 1e-3 (always, post-warmup —
    _nquat returns exact units above that norm), but at the zero-bias init
    the chained gradient through _nquat -> normalize was 1e3 * 1e12 ~ 1e15
    on `rots.bias` (observed as the iter-0 grad_norm spike); torch never
    hits this because nn.Linear bias init is uniform nonzero."""
    l_x = jnp.mean(safe_norm(gt_pose[:, 0:3] - est_tran, axis=1))
    l_q = jnp.mean(
        safe_norm(normalize(gt_pose[:, 3:]) - normalize(est_rot, eps=1e-3), axis=1)
    )
    return l_x, l_q


def rand_aim_rot(rng, batch_size):
    """Random unit quats via uniform rotation vectors in [-2.5, 2.5]^3
    (camera_head.py:688-691), sign-canonicalised."""
    rv = (jax.random.uniform(rng, (batch_size, 3)) * 2.0 - 1.0) * 2.5
    q = normalize(quat_from_rotvec(rv))
    return canonicalize_quat_sign(q)


def rand_aim_trans(rng, batch_size):
    """Random translations in [-2.5, 2.5]^3 (camera_head.py:716)."""
    return (jax.random.uniform(rng, (batch_size, 3)) - 0.5) * 5.0


def rot_rec_loss(input_rot, pred_rot):
    """AIM rotation reconstruction (camera_head.py:705-708)."""
    return jnp.mean(safe_norm(normalize(input_rot) - pred_rot, axis=1))


def trans_rec_loss(input_trans, pred_trans):
    """AIM translation reconstruction (camera_head.py:727-731)."""
    return jnp.mean(safe_norm(input_trans - pred_trans, axis=1))


def refine_losses(ref: Dict, gt_pose, seq_valid, num_matches, suffix: str, weight: float):
    """Losses for one refinement branch (camera_head.py:882-921).

    ref: output dict of PlaneCameraHead.refine (clamp_scores=True).
    """
    losses = {}
    tran_avg, rot_avg = ref["tran_avg_excl"], ref["rot_avg_excl"]
    tran_soft, rot_soft = ref["tran_soft"], ref["rot_soft"]

    lt_avg, lr_avg = camera_pose_loss(tran_avg, rot_avg, gt_pose)
    lt_soft, lr_soft = camera_pose_loss(tran_soft, rot_soft, gt_pose)
    losses[f"loss_tran_planeAvgReg_{suffix}"] = lt_avg * weight
    losses[f"loss_rot_planeAvgReg_{suffix}"] = lr_avg * weight
    losses[f"loss_tran_planeSoftReg_{suffix}"] = lt_soft * weight
    losses[f"loss_rot_planeSoftReg_{suffix}"] = lr_soft * weight

    hyp_valid = ref["hyp_valid"]  # [B, M+1]
    big = jnp.asarray(1e10, ref["rots_all"].dtype)

    rot_err = safe_norm(
        normalize(gt_pose[:, None, 3:]) - normalize(ref["rots_all"]), axis=-1
    )
    rot_err = jnp.where(hyp_valid, rot_err, big)
    best_rot = jnp.argmin(jax.lax.stop_gradient(rot_err), axis=-1)
    score_at = jnp.take_along_axis(ref["score_rot"], best_rot[:, None], axis=1)[:, 0]
    losses[f"loss_rotIdx_{suffix}"] = jnp.mean(jnp.abs(1.0 - score_at)) * 0.01 * weight

    trans_err = safe_norm(gt_pose[:, None, :3] - ref["trans_all"], axis=-1)
    trans_err = jnp.where(hyp_valid, trans_err, big)
    best_tr = jnp.argmin(jax.lax.stop_gradient(trans_err), axis=-1)
    score_at_t = jnp.take_along_axis(ref["score_trans"], best_tr[:, None], axis=1)[:, 0]
    losses[f"loss_transIdx_{suffix}"] = jnp.mean(jnp.abs(1.0 - score_at_t)) * 0.02 * weight

    # paramL2: trace of hypothesis-i vs match-i l2 over matched pairs
    # (camera_head.py:908-911); guarded against m == 0.
    l2 = ref["l2_dist"]  # [B, M+1, M]
    m = l2.shape[-1]
    diag = l2[:, 1:, :][:, jnp.arange(m), jnp.arange(m)]  # [B, M]
    per_img = jnp.sum(diag * seq_valid.astype(l2.dtype), axis=-1) / jnp.maximum(
        num_matches.astype(l2.dtype), 1.0
    )
    losses[f"loss_paramL2_dist_{suffix}"] = jnp.mean(per_img) * 0.1 * weight
    return losses
