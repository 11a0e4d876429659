#!/usr/bin/env python
"""Inference / evaluation CLI, flag-compatible with the reference
test_NopeSAC.py.

Usage:
  python test_NopeSAC.py --config-file configs/inference_mp3d.yaml --eval-only \
      TEST.EVAL_FULL_SCENE True

Runs batched TPU inference over cfg.DATASETS.TEST, evaluates with the
MP3DEvaluator, and (with TEST.EVAL_FULL_SCENE True) writes the
NopeSAC_instances_predictions.pth + continuous.pkl artifacts that eval.py
consumes (the reference's file-level contract, SURVEY.md section 1).
"""
from __future__ import annotations

import logging
import sys

from train_NopeSAC import default_argument_parser, setup

logger = logging.getLogger(__name__)


def main(args):
    cfg = setup(args)

    import os

    import jax

    # NOPESAC_PLATFORM=cpu forces the CPU backend (see train_NopeSAC.py)
    forced = os.environ.get("NOPESAC_PLATFORM")
    if forced:
        jax.config.update("jax_platforms", forced)

    from nopesac_tpu.utils.jax_cache import cpu_cache_dir, tpu_cache_dir

    _here = os.path.dirname(os.path.abspath(__file__))
    jax.config.update(
        "jax_compilation_cache_dir",
        cpu_cache_dir(_here) if forced == "cpu" else tpu_cache_dir(_here))
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    import nopesac_tpu.data.datasets  # noqa: F401
    if cfg.DATASETS.ROOT_DIR:
        # re-register the builtin splits under the configured root (the
        # import above registered them with the default ./datasets paths)
        nopesac_tpu.data.datasets.register_builtin(cfg.DATASETS.ROOT_DIR)
    from nopesac_tpu.engine.trainer import Trainer

    trainer = Trainer(cfg, image_hw=tuple(cfg.INPUT.IMAGE_SIZE),
                      num_devices=args.num_gpus, training=False)
    trainer.resume_or_load(resume=args.resume)
    results = trainer.test()
    for k, v in (results or {}).items():
        logger.info("%s: %s", k, v)
    return results


if __name__ == "__main__":
    args = default_argument_parser().parse_args()
    main(args)
    sys.exit(0)
