#!/usr/bin/env python
"""Diagnostic: stamp each phase of the Trainer init + first step on CPU."""
import os
import sys
import time

os.environ.setdefault("XLA_FLAGS", "--xla_force_host_platform_device_count=8")
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

jax.config.update("jax_platforms", "cpu")

import numpy as np
import jax.numpy as jnp

from nopesac_tpu.config.config import get_cfg
from nopesac_tpu.data.synthetic import make_dataset

H, W = 96, 128


def stamp(msg, t0):
    print(f"[{msg}] {time.time() - t0:.1f}s", flush=True)
    return time.time()


def main():
    cfg = get_cfg()
    cfg.MODEL.MATCHING_HEAD.SINKHORN_ITERS = 5
    cfg.MODEL.EMBEDDING_ON = True
    cfg.MODEL.CAMERA_ON = True
    cfg.MODEL.LOSS_CAMERA_ON = True
    cfg.MODEL.LOSS_EMB_ON = True
    cfg.MODEL.CAMERA_HEAD.NAME = "PlaneCameraHead"
    cfg.MODEL.CAMERA_HEAD.REFINE_ON = True
    cfg.MODEL.CAMERA_HEAD.CAM_REC_ON = True
    cfg.MODEL.CAMERA_HEAD.RAND_ON = True
    cfg.MODEL.SEM_SEG_HEAD.PARAM_ON = True
    cfg.MODEL.SEM_SEG_HEAD.CENTER_ON = True
    cfg.SOLVER.IMS_PER_BATCH = 2
    cfg.SOLVER.MAX_ITER = 2
    cfg.SOLVER.CHECKPOINT_PERIOD = 1000
    cfg.TEST.EVAL_PERIOD = 0
    cfg.OUTPUT_DIR = "/tmp/ttinit"
    cfg.freeze()

    t0 = time.time()
    from nopesac_tpu.engine.trainer import Trainer, build_model_from_cfg

    model = build_model_from_cfg(cfg)
    t0 = stamp("build model", t0)

    from nopesac_tpu.data.mapper import PairMapper, collate

    data = make_dataset(n_pairs=1, n_planes=4, h=H, w=W)
    init_mapper = PairMapper(is_train=True, dataset_kind="mp3d", image_size=(H, W))
    batch = collate([init_mapper(d) for d in data])
    batch.pop("meta", None)
    batch = jax.tree_util.tree_map(jnp.asarray, batch)
    t0 = stamp("make init batch", t0)

    variables = model.init(
        {"params": jax.random.PRNGKey(0), "dropout": jax.random.PRNGKey(1)},
        batch, jax.random.PRNGKey(0), method=model.init_all,
    )
    jax.block_until_ready(variables)
    t0 = stamp("eager model.init(init_all)", t0)

    from nopesac_tpu.engine.optimizer import apply_freeze, build_optimizer
    from nopesac_tpu.engine.train_step import (
        create_train_state, jit_train_step, make_train_step,
    )
    from nopesac_tpu.parallel.mesh import make_mesh, shard_batch

    params = variables["params"]
    tx = apply_freeze(build_optimizer(cfg, params), params,
                      frozen_prefixes=tuple(cfg.MODEL.FREEZE))
    state = create_train_state(params, variables.get("batch_stats", {}), tx)
    t0 = stamp("optimizer + state", t0)

    mesh = make_mesh(2)
    step = jit_train_step(make_train_step(model, tx), mesh)

    data2 = make_dataset(n_pairs=2, n_planes=4, h=H, w=W, seed=5)
    mapper = PairMapper(is_train=True, dataset_kind="mp3d", image_size=(H, W))
    b2 = collate([mapper(d) for d in data2])
    b2.pop("meta", None)
    b2 = shard_batch(jax.tree_util.tree_map(jnp.asarray, b2), mesh)
    t0 = stamp("batch2 + mesh", t0)

    state, metrics = step(state, b2, jax.random.PRNGKey(3))
    jax.block_until_ready(metrics)
    t0 = stamp("first train step (compile+run)", t0)
    print("step1 metrics:", {k: float(v) for k, v in jax.device_get(metrics).items()},
          flush=True)

    state, metrics = step(state, b2, jax.random.PRNGKey(4))
    jax.block_until_ready(metrics)
    t0 = stamp("second train step", t0)
    print("step2 total_loss", float(metrics["total_loss"]), flush=True)

    state, metrics = step(state, b2, jax.random.PRNGKey(5))
    jax.block_until_ready(metrics)
    t0 = stamp("third train step", t0)
    print("step3 total_loss", float(metrics["total_loss"]), flush=True)


if __name__ == "__main__":
    main()
