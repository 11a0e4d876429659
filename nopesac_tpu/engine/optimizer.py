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


def _lr_group(path_s: str) -> str:
    """LR-multiplier group by module prefix (train_NopeSAC.py:123-131)."""
    if "backbone" in path_s:
        return "backbone"
    if "plane_head" in path_s:
        return "sem_seg_head"
    if "matching_head" in path_s:
        return "matcher"
    return "default"


_NORM_MODULE_PREFIXES = ("batchnorm", "layernorm", "groupnorm")


def _decay_group(path_s: str) -> str:
    """Weight-decay override group by OWNING MODULE, like the reference's
    isinstance(module, norm_module_types) / nn.Embedding checks
    (train_NopeSAC.py:132-135). Orthogonal to the LR group — the reference
    composes both (a norm inside backbone gets the backbone multiplier AND
    weight_decay_norm). Module-name matching is exact-prefix on the owning
    path segment: a plain substring test classified e.g.
    camera_head/normal_score_proj/.../bias as a norm parameter ("norm" in
    "normal") and silently zeroed its weight decay.

    Flax norm module names here: BatchNorm_0 / GroupNorm_0 (ConvBN/ConvGN),
    norm / norm1..norm3 (transformer + GNN LayerNorms). FrozenBatchNorm
    leaves never reach the optimizer (apply_freeze zeroes them)."""
    if "query_embed" in path_s:
        return "embed"
    parts = path_s.lower().split("/")
    owner = parts[-2] if len(parts) >= 2 else ""
    if any(owner.startswith(m) for m in _NORM_MODULE_PREFIXES) or (
        owner == "norm" or (owner.startswith("norm") and owner[4:].isdigit())
    ):
        return "norm"
    return "regular"


def _scale_per_leaf(multipliers: Dict[str, float]):
    """Stateless transform multiplying each leaf's update by its group
    multiplier. The label is derived from the leaf's own path at update time
    (NOT from a captured params-shaped tree): when this transform runs inside
    optax.masked (apply_freeze), frozen leaves arrive as MaskedNode subtrees
    with zero leaves, and a captured full tree would fail to line up."""

    def init_fn(params):
        return optax.EmptyState()

    def update_fn(updates, state, params=None):
        scaled = jax.tree_util.tree_map_with_path(
            lambda p, u: u * multipliers[_lr_group(_path_str(p))], updates)
        return scaled, state

    return optax.GradientTransformation(init_fn, update_fn)


def build_optimizer(cfg, params) -> optax.GradientTransformation:
    """Single optimizer chain with per-leaf lr-multiplier / weight-decay
    masks.

    The naive port (optax.multi_transform with one AdamW per parameter
    group) replicates the full optimizer HLO 6x over ~700 leaves, which
    dominates XLA compile time on a single host core. One scale_by_adam +
    masked decay + per-leaf final scale is mathematically identical to
    torch per-group AdamW (update = -lr*mult * (adam(g) + wd*p)).
    """
    s = cfg.SOLVER
    base_sched = make_lr_schedule(
        s.BASE_LR, s.STEPS, s.GAMMA, s.WARMUP_ITERS, s.WARMUP_FACTOR, s.MAX_ITER
    )

    multipliers = {
        "backbone": s.BACKBONE_MULTIPLIER,
        "sem_seg_head": s.SEM_SEG_HEAD_MULTIPLIER,
        "matcher": s.PLANE_MATCHER_HEAD_MULTIPLIER,
        "default": 1.0,
    }
    decays = {
        "regular": s.WEIGHT_DECAY,
        "norm": s.get("WEIGHT_DECAY_NORM", 0.0),
        "embed": s.WEIGHT_DECAY_EMBED,
    }

    labels = jax.tree_util.tree_map_with_path(
        lambda p, _: _decay_group(_path_str(p)), params)

    parts = []
    if cfg.SOLVER.CLIP_GRADIENTS.ENABLED and cfg.SOLVER.CLIP_GRADIENTS.CLIP_TYPE == "full_model":
        parts.append(optax.clip_by_global_norm(cfg.SOLVER.CLIP_GRADIENTS.CLIP_VALUE))

    if s.OPTIMIZER.upper() == "ADAMW":
        parts.append(optax.scale_by_adam(b1=0.9, b2=0.999, eps=1e-8))
    else:  # SGD with momentum
        parts.append(optax.trace(decay=s.MOMENTUM))

    # weight decay: one add_decayed_weights per DISTINCT nonzero decay value
    # (normally just WEIGHT_DECAY with norm/embed masked out)
    distinct_wd = sorted({v for v in decays.values() if v != 0.0})
    for wd in distinct_wd:
        mask = jax.tree_util.tree_map(lambda lb: decays[lb] == wd, labels)
        parts.append(optax.add_decayed_weights(wd, mask=mask))

    parts.append(optax.scale_by_schedule(lambda c: -base_sched(c)))
    if any(m != 1.0 for m in multipliers.values()):
        parts.append(_scale_per_leaf(multipliers))
    return optax.chain(*parts)


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
