"""pjit-able train/eval steps over a data-parallel mesh.

The reference trains with detectron2 DefaultTrainer + DDP (SURVEY.md 2.2);
here a single jitted function carries forward + loss + backward + optimizer
update, with the batch sharded over the `data` mesh axis and parameters
replicated. XLA inserts the gradient all-reduce (ICI) automatically from the
sharding constraints - no explicit collectives needed.
"""
from __future__ import annotations

import functools
from typing import Any, Callable, Dict, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
import optax
from flax import struct
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..parallel.mesh import DATA_AXIS


class TrainState(struct.PyTreeNode):
    step: jax.Array
    params: Any
    batch_stats: Any
    opt_state: Any


def create_train_state(params, batch_stats, tx) -> TrainState:
    return TrainState(
        step=jnp.zeros((), jnp.int32),
        params=params,
        batch_stats=batch_stats,
        opt_state=tx.init(params),
    )


def make_train_step(model, tx, dropout_rng_impl: Optional[str] = None) -> Callable:
    """Returns train_step(state, batch, rng) -> (state, metrics).

    dropout_rng_impl: PRNG implementation for the dropout masks.
    None/"default" resolves to the hardware "rbg" generator on TPU and
    threefry elsewhere: threefry is ALU-heavy on the VPU and the train
    step draws ~200M dropout bits (the 6 encoder layers alone carry an
    attention-weights dropout on [2B, 8, 350, 350]); rbg is
    counter-deterministic given the key, just not invariant across
    backends - fine for dropout masks. "threefry2x32" forces the
    backend-invariant generator (NOPESAC_DROPOUT_RNG env overrides)."""
    import os

    impl = os.environ.get("NOPESAC_DROPOUT_RNG") or dropout_rng_impl
    if impl in (None, "", "default"):
        from ..utils.backend import on_tpu

        impl = "rbg" if on_tpu() else "threefry2x32"

    def train_step(state: TrainState, batch: Dict, rng: jax.Array):
        rng_fold = jax.random.fold_in(rng, state.step)
        drop_rng, aim_rng = jax.random.split(rng_fold)
        if impl != "threefry2x32":
            # derive an impl-specific key deterministically from the
            # threefry stream (key data sizes differ per impl)
            nwords = int(np.prod(jax.random.key_data(
                jax.random.key(0, impl=impl)).shape))
            bits = jax.random.bits(
                drop_rng, (nwords,), jnp.uint32)
            drop_rng = jax.random.wrap_key_data(bits, impl=impl)

        def loss_fn(params):
            (losses), new_state = model.apply(
                {"params": params, "batch_stats": state.batch_stats},
                batch, aim_rng,
                method=model.train_forward,
                mutable=["batch_stats"],
                rngs={"dropout": drop_rng},
            )
            total = jnp.asarray(0.0, jnp.float32)
            for v in losses.values():
                total = total + v.astype(jnp.float32)
            return total, (losses, new_state["batch_stats"])

        (total, (losses, new_bs)), grads = jax.value_and_grad(loss_fn, has_aux=True)(
            state.params
        )
        updates, new_opt = tx.update(grads, state.opt_state, state.params)
        new_params = optax.apply_updates(state.params, updates)

        # NaN guard (SURVEY.md section 5): a non-finite loss or grad norm
        # skips the update (params/opt state kept) instead of poisoning the
        # run - the reference drops into pdb here (camera_head.py:186-187),
        # which is not an option under jit.
        grad_norm = optax.global_norm(grads)
        ok = jnp.isfinite(total) & jnp.isfinite(grad_norm)
        keep = lambda new, old: jax.tree_util.tree_map(
            lambda a, b_: jnp.where(ok, a, b_), new, old)
        new_state = state.replace(
            step=state.step + 1,
            params=keep(new_params, state.params),
            batch_stats=keep(new_bs, state.batch_stats),
            opt_state=keep(new_opt, state.opt_state),
        )
        metrics = dict(losses)
        metrics["total_loss"] = total
        metrics["grad_norm"] = grad_norm
        metrics["skipped_nonfinite"] = (~ok).astype(jnp.float32)
        return new_state, metrics

    return train_step


def jit_train_step(train_step: Callable, mesh: Mesh) -> Callable:
    """jit with replicated state and batch sharded over the data axis."""
    repl = NamedSharding(mesh, P())
    data = NamedSharding(mesh, P(DATA_AXIS))
    return jax.jit(
        train_step,
        in_shardings=(repl, data, repl),
        out_shardings=(repl, repl),
        donate_argnums=(0,),
    )


def make_eval_step(model, out_h: int = 480, out_w: int = 640,
                   with_gt_geo: bool = False,
                   with_init_cam: bool = False,
                   pixel_mean=None, pixel_std=None) -> Callable:
    """with_gt_geo=True adds a gt_geo argument for the GT-matcher pose
    refinement ablation (cfg.TEST.POSE_REFINEMENT_WITH_GT_MATCHERS; spec
    camera_head.py:520-547). with_init_cam=True adds an init_cam argument
    ({tran [B,3], rot [B,4]}) for the SparsePlanes top-1-camera substitution
    (cfg.MODEL.CAMERA_HEAD.INFERENCE_SP_TOPCAM_ON; spec
    camera_head.py:419-431).

    pixel_mean/pixel_std: when given, the step accepts RAW uint8 images and
    normalises in-graph — (f32(u8) - mean) * (1/std), the exact IEEE ops the
    host mapper performs, so results are bit-equal while the host->device
    transfer shrinks 4x (PairMapper raw_uint8 transport)."""
    if pixel_mean is not None:
        import numpy as np

        _mean = jnp.asarray(np.asarray(pixel_mean, np.float32))
        _inv_std = jnp.asarray(
            (1.0 / np.asarray(pixel_std, np.float32)).astype(np.float32))

        def _norm(img):
            return (img.astype(jnp.float32) - _mean) * _inv_std
    else:
        def _norm(img):
            return img
    if with_gt_geo and with_init_cam:
        def eval_step(variables, image0, image1, gt_geo, init_cam):
            return model.apply(variables, _norm(image0), _norm(image1),
                               method=model.inference,
                               out_h=out_h, out_w=out_w, gt_geo=gt_geo,
                               init_cam=init_cam)
    elif with_gt_geo:
        def eval_step(variables, image0, image1, gt_geo):
            return model.apply(variables, _norm(image0), _norm(image1),
                               method=model.inference,
                               out_h=out_h, out_w=out_w, gt_geo=gt_geo)
    elif with_init_cam:
        def eval_step(variables, image0, image1, init_cam):
            return model.apply(variables, _norm(image0), _norm(image1),
                               method=model.inference,
                               out_h=out_h, out_w=out_w, init_cam=init_cam)
    else:
        def eval_step(variables, image0, image1):
            return model.apply(variables, _norm(image0), _norm(image1),
                               method=model.inference,
                               out_h=out_h, out_w=out_w)

    return eval_step
