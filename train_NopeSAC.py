#!/usr/bin/env python
"""Training CLI, flag-compatible with the reference train_NopeSAC.py.

Usage (same commands as the reference README):
  python train_NopeSAC.py --config-file configs/train_mp3d_step1.yaml [opts...]

TPU notes: --num-gpus is accepted and interpreted as the number of local
devices to use (the data mesh spans all visible devices by default);
multi-host runs use --num-machines/--machine-rank/--dist-url via
jax.distributed (SURVEY.md 2.2).
"""
from __future__ import annotations

import argparse
import logging
import os
import random
import shutil
import sys

import numpy as np


def default_argument_parser():
    p = argparse.ArgumentParser(description="NopeSAC-TPU training")
    p.add_argument("--config-file", default="", metavar="FILE")
    p.add_argument("--resume", action="store_true")
    p.add_argument("--eval-only", action="store_true")
    p.add_argument("--num-gpus", type=int, default=None,
                   help="devices per machine (TPU chips); default: all visible")
    p.add_argument("--num-machines", type=int, default=1)
    p.add_argument("--machine-rank", type=int, default=0)
    p.add_argument("--dist-url", default="auto")
    p.add_argument("opts", default=None, nargs=argparse.REMAINDER)
    return p


def setup(args):
    from nopesac_tpu.config.config import get_cfg

    cfg = get_cfg()
    if args.config_file:
        cfg.merge_from_file(args.config_file)
    if args.opts:
        cfg.merge_from_list(args.opts)
    cfg.freeze()
    os.makedirs(cfg.OUTPUT_DIR, exist_ok=True)
    logging.basicConfig(
        level=logging.INFO,
        format="[%(asctime)s %(name)s] %(message)s",
        handlers=[
            logging.StreamHandler(),
            logging.FileHandler(os.path.join(cfg.OUTPUT_DIR, "log.txt")),
        ],
    )
    return cfg


def copy_all_code(output_dir: str):
    """Snapshot the framework code into OUTPUT_DIR/code (train_NopeSAC.py:44-61)."""
    dst = os.path.join(output_dir, "code")
    src = os.path.join(os.path.dirname(os.path.abspath(__file__)), "nopesac_tpu")
    if os.path.exists(dst):
        shutil.rmtree(dst)
    shutil.copytree(src, os.path.join(dst, "nopesac_tpu"),
                    ignore=shutil.ignore_patterns("__pycache__", "*.pyc"))


def fix_seeds(seed: int):
    random.seed(seed)
    np.random.seed(seed)
    os.environ["PYTHONHASHSEED"] = str(seed)


def main(args):
    cfg = setup(args)

    import jax

    # NOPESAC_PLATFORM=cpu forces the CPU backend (JAX_PLATFORMS is
    # overridden by sitecustomize on some images; jax.config wins). Useful
    # for smoke-driving the CLIs when no TPU is reachable.
    forced = os.environ.get("NOPESAC_PLATFORM")
    if forced:
        jax.config.update("jax_platforms", forced)

    # persistent compilation cache: the first run pays the XLA compile cost,
    # later runs (and resume) start in seconds
    from nopesac_tpu.utils.jax_cache import cpu_cache_dir, tpu_cache_dir

    _here = os.path.dirname(os.path.abspath(__file__))
    jax.config.update(
        "jax_compilation_cache_dir",
        cpu_cache_dir(_here) if forced == "cpu" else tpu_cache_dir(_here))
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    if args.num_machines > 1:
        jax.distributed.initialize(
            coordinator_address=None if args.dist_url == "auto" else args.dist_url,
            num_processes=args.num_machines,
            process_id=args.machine_rank,
        )

    if cfg.FIX_SEED:
        fix_seeds(cfg.SEED)

    import nopesac_tpu.data.datasets  # noqa: F401  (registers builtin splits)
    if cfg.DATASETS.ROOT_DIR:
        # re-register the builtin splits under the configured root (the
        # import above registered them with the default ./datasets paths)
        nopesac_tpu.data.datasets.register_builtin(cfg.DATASETS.ROOT_DIR)
    from nopesac_tpu.engine.trainer import Trainer

    if jax.process_index() == 0:
        copy_all_code(cfg.OUTPUT_DIR)

    trainer = Trainer(cfg, image_hw=tuple(cfg.INPUT.IMAGE_SIZE),
                      num_devices=args.num_gpus, training=not args.eval_only)
    if args.eval_only:
        trainer.resume_or_load(resume=args.resume)
        return trainer.test()
    trainer.resume_or_load(resume=args.resume)
    trainer.train()
    return None


if __name__ == "__main__":
    args = default_argument_parser().parse_args()
    main(args)
    sys.exit(0)
