"""Optimizer construction: AdamW/SGD with per-module LR multipliers,
norm/embedding weight-decay exceptions, full-model grad clipping, and the
d2 WarmupMultiStepLR schedule.

Spec: train_NopeSAC.py:88-169 (build_optimizer) + configs (Base.yaml SOLVER).
Implemented as optax transform chains with a label-based multi_transform.
"""
from __future__ import annotations

from typing import Any, Dict

import jax
import jax.numpy as jnp
import optax


def _path_str(path) -> str:
    return "/".join(str(getattr(k, "key", getattr(k, "idx", k))) for k in path)


def make_lr_schedule(base_lr: float, steps, gamma: float, warmup_iters: int,
                     warmup_factor: float, max_iter: int):
    """d2 WarmupMultiStepLR: lr * gamma^(#milestones passed), linear warmup."""
    steps = sorted(int(s) for s in steps)

    def schedule(count):
        lr = jnp.asarray(base_lr, jnp.float32)
        for s in steps:
            lr = jnp.where(count >= s, lr * gamma, lr)
        if warmup_iters > 0 and warmup_factor < 1.0:
            alpha = jnp.clip(count / max(warmup_iters, 1), 0.0, 1.0)
            w = warmup_factor * (1 - alpha) + alpha
            lr = lr * w
        return lr

    return schedule


def _classify(path_s: str) -> str:
    """Parameter group labels (train_NopeSAC.py:123-135).

    Norm/embedding detection is name-based in the flax tree:
      * FrozenBatchNorm params never reach the optimizer state in the
        reference (requires_grad True but lr irrelevant since frozen stats;
        they DO train in d2 actually - scale/bias are Parameters with
        requires_grad False by default in FrozenBatchNorm2d, so: excluded).
      * BatchNorm/LayerNorm/GroupNorm scale+bias -> weight_decay_norm (d2
        default 0.0).
      * query_embed -> weight_decay_embed (0.0).
    """
    if "query_embed" in path_s:
        return "embed"
    low = path_s.lower()
    if any(t in low for t in ("batchnorm", "layernorm", "groupnorm", "norm/")) or (
        low.endswith("/scale") or low.endswith("/bias")
    ) and ("norm" in low):
        return "norm"
    if "backbone" in path_s:
        return "backbone"
    if "plane_head" in path_s:
        return "sem_seg_head"
    if "matching_head" in path_s:
        return "matcher"
    return "default"


def build_optimizer(cfg, params) -> optax.GradientTransformation:
    s = cfg.SOLVER
    base_sched = make_lr_schedule(
        s.BASE_LR, s.STEPS, s.GAMMA, s.WARMUP_ITERS, s.WARMUP_FACTOR, s.MAX_ITER
    )

    multipliers = {
        "backbone": s.BACKBONE_MULTIPLIER,
        "sem_seg_head": s.SEM_SEG_HEAD_MULTIPLIER,
        "matcher": s.PLANE_MATCHER_HEAD_MULTIPLIER,
        "default": 1.0,
        "norm": 1.0,
        "embed": 1.0,
    }
    decays = {
        "backbone": s.WEIGHT_DECAY,
        "sem_seg_head": s.WEIGHT_DECAY,
        "matcher": s.WEIGHT_DECAY,
        "default": s.WEIGHT_DECAY,
        "norm": 0.0,  # d2 WEIGHT_DECAY_NORM default
        "embed": s.WEIGHT_DECAY_EMBED,
    }

    def group_tx(label):
        mult = multipliers[label]
        wd = decays[label]
        sched = lambda c: base_sched(c) * mult
        if s.OPTIMIZER.upper() == "ADAMW":
            return optax.adamw(sched, b1=0.9, b2=0.999, eps=1e-8, weight_decay=wd)
        return optax.chain(
            optax.trace(decay=s.MOMENTUM),
            optax.add_decayed_weights(wd),
            optax.scale_by_schedule(lambda c: -sched(c)),
        )

    labels = jax.tree_util.tree_map_with_path(lambda p, _: _classify(_path_str(p)), params)
    tx = optax.multi_transform({k: group_tx(k) for k in multipliers}, labels)

    if cfg.SOLVER.CLIP_GRADIENTS.ENABLED and cfg.SOLVER.CLIP_GRADIENTS.CLIP_TYPE == "full_model":
        tx = optax.chain(optax.clip_by_global_norm(cfg.SOLVER.CLIP_GRADIENTS.CLIP_VALUE), tx)
    return tx


_FROZEN_BN_NAMES = ("bn1", "bn2", "bn3", "shortcut_bn", "stem_bn1")


def freeze_params_mask(params, frozen_prefixes=()) -> Any:
    """Boolean pytree: True where the parameter is trainable.

    Mirrors cfg.MODEL.FREEZE (siamese_planeTR.py:108-116) plus FrozenBN
    affine/stats, which are buffers (not Parameters) in the d2 reference and
    must never receive updates.
    """

    def trainable(path, _):
        ps = _path_str(path)
        if any(f and f in ps for f in frozen_prefixes):
            return False
        parts = ps.split("/")
        if any(p in _FROZEN_BN_NAMES for p in parts):
            return False
        return True

    return jax.tree_util.tree_map_with_path(trainable, params)


def apply_freeze(tx: optax.GradientTransformation, params, frozen_prefixes=()):
    """Only apply updates to trainable parameters; frozen ones get zeros.

    NOTE optax.masked leaves non-masked updates UNCHANGED (i.e. the raw
    gradient would leak through), so frozen leaves are explicitly zeroed.
    """
    mask = freeze_params_mask(params, frozen_prefixes)
    inv = jax.tree_util.tree_map(lambda m: not m, mask)
    return optax.chain(
        optax.masked(optax.set_to_zero(), inv),
        optax.masked(tx, mask),
    )
