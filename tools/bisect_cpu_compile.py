#!/usr/bin/env python
"""Diagnostic: compile-time bisect of the TRAIN graph on CPU (1 core).

Usage: python tools/bisect_cpu_compile.py <stage> [batch]
Stages (implemented): jv, detloss, trainfwd, all
"""
import os
import sys
import time

os.environ.setdefault("XLA_FLAGS", "--xla_force_host_platform_device_count=8")

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

import jax
import jax.numpy as jnp

jax.config.update("jax_platforms", "cpu")


def stamp(msg, t0):
    print(f"[{msg}] {time.time() - t0:.1f}s", flush=True)
    return time.time()


H, W = 96, 128
B = 2


def make_batch():
    from nopesac_tpu.data.mapper import PairMapper, collate
    from nopesac_tpu.data.synthetic import make_dataset

    data = make_dataset(n_pairs=B, n_planes=4, h=H, w=W, seed=5)
    mapper = PairMapper(is_train=True, dataset_kind="mp3d", image_size=(H, W))
    batch = collate([mapper(d) for d in data])
    batch.pop("meta")
    return jax.tree_util.tree_map(jnp.asarray, batch)


STAGES = ("jv", "detloss", "trainfwd", "all")


def main(stage, batch_size=None):
    if stage not in STAGES:
        raise SystemExit(f"unknown stage {stage!r}; implemented: {STAGES}")
    global B
    if batch_size:
        B = batch_size
    t0 = time.time()

    if stage in ("jv", "all"):
        from nopesac_tpu.losses.hungarian import hungarian_device

        c = jnp.asarray(np.random.rand(4, 50, 50).astype(np.float32))
        nv = jnp.asarray(np.full((4,), 7, np.int32))
        f = jax.jit(hungarian_device).lower(c, nv).compile()
        t0 = stamp("jv compile", t0)
        out = f(c, nv)
        jax.block_until_ready(out)
        t0 = stamp("jv run", t0)

    if stage in ("detloss", "all"):
        from nopesac_tpu.losses import criterion as CR

        nq, ng = 50, 50
        h2, w2 = H // 4, W // 4
        outputs = {
            "pred_logits": jnp.zeros((2 * B, nq, 2)),
            "pred_mask_logits": jnp.zeros((2 * B, nq, h2, w2)),
            "pred_centers": jnp.zeros((2 * B, nq, 2)),
            "pred_params": jnp.zeros((2 * B, nq, 3)),
        }
        targets = {
            "gt_valid": jnp.ones((2 * B, ng), bool),
            "gt_masks": jnp.ones((2 * B, ng, H, W), jnp.float32),
            "gt_centers": jnp.zeros((2 * B, ng, 2)),
            "gt_params": jnp.ones((2 * B, ng, 3)),
            "gt_pixel_centers": jnp.zeros((2 * B, H, W, 2)),
            "depth": jnp.ones((2 * B, H, W)),
            "k_inv_dot_xy1": jnp.ones((2 * B, 3, H, W)),
        }
        mw = {"cost_class": 1.0, "cost_mask": 20.0, "cost_dice": 1.0,
              "cost_center": 0.5, "cost_param": 0.25,
              "cost_param_offset": 0.01, "cost_param_normal_angle": 0.0028}

        def loss_fn(out):
            m = CR.match_planes(out, targets, mw)
            d = CR.detection_losses_siamese(out, targets, m)
            return sum(jax.tree_util.tree_leaves(d))

        f = jax.jit(jax.grad(lambda o: loss_fn(o))).lower(outputs).compile()
        t0 = stamp("detloss grad compile (1 level)", t0)

    if stage in ("trainfwd", "all"):
        from nopesac_tpu.models.nopesac import PlaneTRNopeSAC

        model = PlaneTRNopeSAC(sinkhorn_iterations=10)
        batch = make_batch()
        rng = jax.random.PRNGKey(0)
        variables = jax.eval_shape(
            lambda: model.init({"params": jax.random.PRNGKey(0),
                                "dropout": jax.random.PRNGKey(1)},
                               batch, rng, method=model.train_forward))
        t0 = stamp("trainfwd init eval_shape", t0)

        def loss(params_all):
            out, _ = model.apply(params_all, batch, rng, method=model.train_forward,
                                 rngs={"dropout": jax.random.PRNGKey(2)},
                                 mutable=["batch_stats"])
            return sum(jax.tree_util.tree_leaves(out))

        f = jax.jit(jax.grad(loss)).lower(
            jax.tree_util.tree_map(lambda s: jnp.zeros(s.shape, s.dtype), variables))
        t0 = stamp("trainfwd grad lower", t0)
        f = f.compile()
        t0 = stamp("trainfwd grad compile", t0)


if __name__ == "__main__":
    main(sys.argv[1] if len(sys.argv) > 1 else "all",
         int(sys.argv[2]) if len(sys.argv) > 2 else None)
