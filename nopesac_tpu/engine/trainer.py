"""Training loop: the TPU-native replacement for detectron2 DefaultTrainer.

Spec: train_NopeSAC.py:63-205 (Trainer) + d2 engine internals it relies on:
  * per-module LR multipliers / clipping via engine/optimizer.py
  * periodic checkpoints + resume (engine/checkpoint.py)
  * rank-0 metrics logging to OUTPUT_DIR/metrics.json + metrics.txt
  * periodic evaluation through the MP3DEvaluator
  * config + code snapshot into OUTPUT_DIR (copy_all_code, train_NopeSAC.py:44-61)
"""
from __future__ import annotations

import json
import logging
import os
import time
from typing import Dict, List, Optional

import jax
import jax.numpy as jnp
from jax.sharding import NamedSharding, PartitionSpec as P
import numpy as np

from ..config.config import CfgNode
from ..data.loader import PairLoader
from ..data.mapper import PairMapper
from ..data.registry import DatasetCatalog
from ..models.nopesac import PlaneTRNopeSAC
from ..parallel.mesh import make_mesh, shard_batch, staggered_compile
from .checkpoint import Checkpointer
from .optimizer import apply_freeze, build_optimizer
from .train_step import create_train_state, jit_train_step, make_eval_step, make_train_step

logger = logging.getLogger(__name__)


def perturb_planes(params: np.ndarray, rng: np.random.Generator,
                   scale_offset: float, scale_normal_deg: float) -> np.ndarray:
    """Gaussian-perturb plane params (GT-matcher noise ablation).

    Spec camera_head.py:1233-1272: offset += N(0, scale_offset); normal is
    rotated by a random Euler rotation with angles N(0, scale_normal_deg).
    params: [N, 3] (zero rows stay zero). The reference draws one noise set
    per view and reuses it across its three get_gt_geo_sequence calls; here
    the single perturbed param array plays that role.
    """
    from ..utils.np_geometry import rotmat_from_euler_deg as np_euler

    n = params.shape[0]
    offset = np.linalg.norm(params, axis=-1, keepdims=True)  # [N, 1]
    valid = offset[:, 0] > 1e-8
    normal = params / np.maximum(offset, 1e-8)
    ang = rng.normal(0.0, scale_normal_deg, size=(n, 3)).astype(np.float32)
    rot = np_euler(ang[:, 0], ang[:, 1], ang[:, 2])  # [N, 3, 3]
    normal = np.einsum("nij,nj->ni", rot, normal)
    normal /= np.maximum(np.linalg.norm(normal, axis=-1, keepdims=True), 1e-8)
    offset = offset + rng.normal(0.0, scale_offset, size=(n, 1)).astype(np.float32)
    out = (offset * normal).astype(np.float32)
    out[~valid] = 0.0
    return out


def gt_geo_from_samples(chunk: List[dict], samples: List[dict], nq: int,
                        noise_rng=None, scale_offset: float = 0.1,
                        scale_normal_deg: float = 10.0) -> Dict[str, np.ndarray]:
    """Host-side GT-matcher inputs for PlaneTRNopeSAC.inference(gt_geo=...).

    Builds [B,nq,3] zero-padded GT plane params per view from the pair
    annotations (camera_head.py:1205-1219) plus the mapper's corr arrays;
    optionally applies the Gaussian noise ablation (perturb_planes).
    """
    bsz = len(chunk)
    params0 = np.zeros((bsz, nq, 3), np.float32)
    params1 = np.zeros((bsz, nq, 3), np.float32)
    for i, pair in enumerate(chunk):
        for view, dst in (("0", params0), ("1", params1)):
            planes = [ann["plane"] for ann in pair[view].get("annotations", [])][:nq]
            if planes:
                arr = np.asarray(planes, np.float32)
                if noise_rng is not None:
                    arr = perturb_planes(arr, noise_rng, scale_offset, scale_normal_deg)
                dst[i, : len(planes)] = arr
    return {
        "params0": params0,
        "params1": params1,
        "corr_idx1": np.stack([s["corr_idx1"] for s in samples]),
        "corr_idx2": np.stack([s["corr_idx2"] for s in samples]),
        "corr_valid": np.stack([s["corr_valid"] for s in samples]),
    }


def _resolve_dtype_cfg(value: str, key: str):
    """Map a config dtype string to a jnp dtype, rejecting typos ("bf16",
    "fp32", ...) instead of silently falling back to float32."""
    table = {"float32": jnp.float32, "bfloat16": jnp.bfloat16}
    if value not in table:
        raise ValueError(
            f"MODEL.{key} must be one of {sorted(table)}, got {value!r}")
    return table[value]


def build_model_from_cfg(cfg: CfgNode, dtype=None) -> PlaneTRNopeSAC:
    """dtype=None resolves MODEL.COMPUTE_DTYPE from the config (bf16 compute
    with f32 master weights when "bfloat16"); pass explicitly to override."""
    if dtype is None:
        dtype = _resolve_dtype_cfg(
            cfg.MODEL.get("COMPUTE_DTYPE", "float32"), "COMPUTE_DTYPE")
    h = cfg.MODEL.SEM_SEG_HEAD
    cam = cfg.MODEL.CAMERA_HEAD
    return PlaneTRNopeSAC(
        num_queries=h.NUM_OBJECT_QUERIES,
        embedding_on=cfg.MODEL.EMBEDDING_ON,
        camera_on=cfg.MODEL.CAMERA_ON,
        depth_on=cfg.MODEL.DEPTH_ON,
        cam_rec_on=cam.CAM_REC_ON,
        cam_ref_on=cam.REFINE_ON,
        warp_plane_in_cam_ref_on=cam.WARP_PLANE_IN_CAM_REF_ON,
        offset_multiplier=cfg.MODEL.MATCHING_HEAD.OFFSET_MULTIPLIER,
        normal_multiplier=cfg.MODEL.MATCHING_HEAD.NORMAL_MULTIPLIER,
        sinkhorn_iterations=cfg.MODEL.MATCHING_HEAD.get("SINKHORN_ITERS", 200),
        plane_score_threshold=cfg.TEST.PLANE_SCORE_THRESHOLD,
        mask_prob_threshold=cfg.TEST.MASK_PROB_THRESHOLD,
        overlap_threshold=cfg.TEST.OVERLAP_THRESHOLD,
        matching_score_threshold=cfg.TEST.MATCHING_SCORE_THRESHOLD,
        inference_out_cam_type=cam.INFERENCE_OUT_CAM_TYPE,
        transformer_dropout=h.get("DROPOUT", 0.1),
        remat_backbone=cfg.MODEL.get("REMAT", True),
        backbone_train_dtype=_resolve_dtype_cfg(
            cfg.MODEL.get("BACKBONE_TRAIN_DTYPE", "float32"),
            "BACKBONE_TRAIN_DTYPE"),
        fpn_train_dtype=_resolve_dtype_cfg(
            cfg.MODEL.get("FPN_TRAIN_DTYPE", "float32"), "FPN_TRAIN_DTYPE"),
        loss_detection_on=cfg.MODEL.LOSS_DETECTION_ON,
        loss_camera_on=cfg.MODEL.LOSS_CAMERA_ON,
        loss_matching_on=cfg.MODEL.LOSS_EMB_ON,
        matcher_on=cfg.MODEL.HUNGARIAN_MATCHER_ON,
        rand_on=cam.RAND_ON,
        no_object_weight=h.NO_OBJECT_WEIGHT,
        dice_weight=h.DICE_WEIGHT,
        mask_weight=h.MASK_WEIGHT,
        param_weight_l1=h.PARAM_WEIGHT_L1,
        param_weight_cos=h.PARAM_WEIGHT_COS,
        param_hm_weight_l1=h.PARAM_HM_WEIGHT_L1,
        param_weight_q=h.PARAM_WEIGHT_Q,
        center_ins_weight=h.PARAM_WEIGHT_CENTER_INS,
        param_weight_angle=h.PARAM_WEIGHT_ANGLE,
        param_weight_offset=h.PARAM_WEIGHT_OFFSET,
        initial_cam_weight=cam.INITIAL_CAM_WEIGHT,
        plane_cam_weight=cam.PLANE_CAM_WEIGHT,
        plane_cam_weight_predplane=cam.PLANE_CAM_WEIGHT_PREDPLANE,
        dtype=dtype,
    )


def _flatten_metrics(tree, prefix: str = "") -> Dict[str, float]:
    """Nested evaluator results -> flat {dotted_key: float} for metrics.json
    (non-numeric leaves are dropped)."""
    flat: Dict[str, float] = {}
    for k, v in tree.items():
        key = f"{prefix}{k}"
        if isinstance(v, dict):
            flat.update(_flatten_metrics(v, prefix=f"{key}."))
        else:
            try:
                flat[key] = float(v)
            except (TypeError, ValueError):
                continue
    return flat


def _dataset_kind(name: str) -> str:
    return "scannet" if "scannet" in name else "mp3d"


class Trainer:
    """End-to-end trainer mirroring the reference CLI behaviour."""

    def __init__(self, cfg: CfgNode, dataset_list: Optional[List[dict]] = None,
                 image_hw=(480, 640), num_devices: Optional[int] = None,
                 training: bool = True):
        """num_devices: explicit device count (the CLI's --num-gpus). Fails
        loudly when unsatisfiable, mirroring d2 launch() semantics
        (reference train_NopeSAC.py:265-272); None = use all visible devices
        that evenly divide the batch. training=False (eval-only CLIs) skips
        the SOLVER.IMS_PER_BATCH divisibility check — the eval loop runs
        unsharded, so --num-gpus only bounds the visible-device count."""
        self.cfg = cfg
        self.image_hw = image_hw
        os.makedirs(cfg.OUTPUT_DIR, exist_ok=True)
        self._dump_config()

        self.model = build_model_from_cfg(cfg)
        # the data mesh must evenly divide the global batch
        import math

        n_dev = len(jax.devices())
        n_proc = jax.process_count()
        local_mesh = False
        if not training:
            # eval runs per-host unsharded over this host's dataset shard
            # (reference: per-rank test loader + comm.gather,
            # mp3d_evaluation.py:317-319); a cross-process mesh would make
            # jit fail on every host whose devices it omits
            if num_devices is not None and num_devices > n_dev:
                raise ValueError(
                    f"--num-gpus {num_devices} requested but only {n_dev} "
                    f"device(s) visible")
            n_use, local_mesh = 1, True
        elif n_proc > 1:
            # multi-host DP: one global program over ALL devices — a partial
            # mesh would leave some host's devices outside the computation
            if num_devices is not None and num_devices != n_dev:
                raise ValueError(
                    f"--num-gpus {num_devices} != {n_dev} global devices; "
                    "multi-host training uses every device of every process")
            if cfg.SOLVER.IMS_PER_BATCH % n_dev != 0:
                raise ValueError(
                    f"SOLVER.IMS_PER_BATCH={cfg.SOLVER.IMS_PER_BATCH} must "
                    f"divide by the {n_dev} global devices for multi-host DP")
            n_use = n_dev
        elif num_devices is not None:
            if num_devices > n_dev:
                raise ValueError(
                    f"--num-gpus {num_devices} requested but only {n_dev} "
                    f"device(s) visible")
            if cfg.SOLVER.IMS_PER_BATCH % num_devices != 0:
                raise ValueError(
                    f"--num-gpus {num_devices} does not divide "
                    f"SOLVER.IMS_PER_BATCH={cfg.SOLVER.IMS_PER_BATCH}")
            n_use = num_devices
        else:
            n_use = math.gcd(cfg.SOLVER.IMS_PER_BATCH, n_dev)
        self.mesh = make_mesh(n_use, local=local_mesh)
        self._repl = NamedSharding(self.mesh, P())
        if n_use != n_dev:
            logger.warning("using %d of %d devices (batch %d not divisible)",
                           n_use, n_dev, cfg.SOLVER.IMS_PER_BATCH)
        self.checkpointer = Checkpointer(cfg.OUTPUT_DIR)
        self._train_dataset = dataset_list
        self._loader = None
        self._init_state()

    def _build_train_loader(self):
        cfg = self.cfg
        train_name = cfg.DATASETS.TRAIN[0]
        dataset_list = self._train_dataset or DatasetCatalog.get(train_name)
        mapper = PairMapper(
            is_train=True,
            dataset_kind=_dataset_kind(train_name),
            root_dir=cfg.DATASETS.ROOT_DIR,
            num_queries=cfg.MODEL.SEM_SEG_HEAD.NUM_OBJECT_QUERIES,
            image_size=self.image_hw,
            pixel_mean=cfg.MODEL.PIXEL_MEAN,
            pixel_std=cfg.MODEL.PIXEL_STD,
            camera_on=cfg.MODEL.CAMERA_ON,
            depth_on=True,
            augmentation=cfg.DATALOADER.AUGMENTATION,
            seed=cfg.SEED,
            camera_cls_on=cfg.MODEL.CAMERA_HEAD.CLASSIFICATION_ON,
        )
        return PairLoader(
            dataset_list, mapper,
            # each host loads only ITS slice of the global batch; shard_batch
            # assembles the global array from the per-process slices
            batch_size=cfg.SOLVER.IMS_PER_BATCH // jax.process_count(),
            shuffle=True, drop_last=True, seed=cfg.SEED,
            num_shards=jax.process_count(), shard_id=jax.process_index(),
            infinite=True,
            num_workers=int(cfg.DATALOADER.NUM_WORKERS),
        )

    def _dump_config(self):
        if jax.process_index() != 0:
            return
        with open(os.path.join(self.cfg.OUTPUT_DIR, "config.yaml"), "w") as f:
            f.write(self.cfg.dump())

    def _init_state(self):
        # synthetic batch to shape-init the model (shapes depend only on the
        # image size, not on real data)
        from ..data.mapper import collate
        from ..data.synthetic import make_dataset

        h, w = self.image_hw
        data = make_dataset(n_pairs=1, n_planes=4, h=h, w=w)
        # num_queries MUST track the config: a probe batch padded to the
        # default 50 slots crashes the matcher for any model with
        # NUM_OBJECT_QUERIES != 50 (e.g. the ScanNet configs' 25 — caught by
        # tests/test_two_process.py::test_two_process_midtrain_eval)
        init_mapper = PairMapper(
            is_train=True, dataset_kind="mp3d", image_size=(h, w),
            num_queries=self.cfg.MODEL.SEM_SEG_HEAD.NUM_OBJECT_QUERIES)
        batch = collate([init_mapper(d) for d in data])
        batch.pop("meta", None)
        batch = jax.tree_util.tree_map(jnp.asarray, batch)
        # jit the init: one compiled graph (persistently cacheable) instead of
        # thousands of eager op dispatches (2-3x faster on a single host core)
        variables = jax.jit(
            lambda b: self.model.init(
                {"params": jax.random.PRNGKey(self.cfg.SEED),
                 "dropout": jax.random.PRNGKey(self.cfg.SEED + 1)},
                b, jax.random.PRNGKey(0), method=self.model.init_all,
            )
        )(batch)
        params = variables["params"]
        batch_stats = variables.get("batch_stats", {})
        if self.cfg.MODEL.WEIGHTS:
            params, batch_stats = self._load_weights(
                params, self.cfg.MODEL.WEIGHTS, batch_stats)
        self.tx = apply_freeze(
            build_optimizer(self.cfg, params), params,
            frozen_prefixes=tuple(self.cfg.MODEL.FREEZE),
        )
        self.state = create_train_state(params, batch_stats, self.tx)
        # replicate onto the mesh NOW: the jitted step's inputs/outputs are
        # NamedSharding(mesh, P()); feeding a SingleDeviceSharding state on
        # the first call(s) makes jit compile a separate specialisation per
        # placement (observed: the full train step compiled twice per run).
        # Multi-host: this device_put is the program's FIRST cross-process
        # collective (jax verifies replicated values agree), so bound the
        # compile-time skew entering gloo's 30s clique-init window first.
        if jax.process_count() > 1:
            from ..parallel.mesh import coordination_barrier

            coordination_barrier("init_state_device_put")
        self.state = jax.device_put(self.state, self._repl)
        self.train_step = jit_train_step(make_train_step(self.model, self.tx), self.mesh)

    def _load_weights(self, params, path: str, batch_stats):
        if path.endswith(".pth") or path.endswith(".pkl"):
            from ..utils.torch_import import import_torch_weights

            # batch_stats too: BN running means/vars live outside params in
            # flax, and a trained torch checkpoint's stats are load-bearing
            return import_torch_weights(params, path, batch_stats=batch_stats)
        # orbax checkpoint (curriculum chaining: step N's model_final feeds
        # step N+1's MODEL.WEIGHTS, train_mp3d_step2.yaml). The consuming
        # model may have NEW submodules (step1 -> step2 adds matching/camera
        # heads), so restore raw and overlay by path like d2's
        # DetectionCheckpointer; params + batch_stats only — each curriculum
        # stage starts a fresh optimizer (resume_or_load(resume=False)).
        from .checkpoint import load_orbax_tree, merge_pytree

        if not os.path.exists(path):
            raise FileNotFoundError(f"MODEL.WEIGHTS not found: {path}")
        loaded = load_orbax_tree(path)
        params, miss_p, unexp_p = merge_pytree(
            params, loaded.get("params", {}), "params.")
        batch_stats, miss_b, _ = merge_pytree(
            batch_stats, loaded.get("batch_stats", {}), "batch_stats.")
        missing = miss_p + miss_b
        if missing:
            logger.info("MODEL.WEIGHTS: %d tree paths kept fresh init "
                        "(new submodules): %s%s", len(missing),
                        ", ".join(missing[:8]),
                        " ..." if len(missing) > 8 else "")
        if unexp_p:
            logger.warning("MODEL.WEIGHTS: %d checkpoint-only paths ignored: %s%s",
                           len(unexp_p), ", ".join(unexp_p[:8]),
                           " ..." if len(unexp_p) > 8 else "")
        return params, batch_stats

    def resume_or_load(self, resume: bool = False):
        if resume:
            latest = self.checkpointer.latest()
            if jax.process_count() > 1:
                # every host must see the SAME checkpoint (host 0 alone
                # writes; a non-shared OUTPUT_DIR or a racing restart would
                # otherwise resume host 0 at step N while others start at 0
                # — divergent replicated state + mismatched loop bounds that
                # deadlock with no diagnostic). Fail loudly instead.
                from ..parallel.host_gather import all_gather_objects

                tags = all_gather_objects(latest)
                if len(set(tags)) != 1:
                    raise RuntimeError(
                        "--resume: hosts disagree on the latest checkpoint "
                        f"(per-process: {tags}). OUTPUT_DIR must be a shared "
                        "filesystem visible to every host.")
            if latest is None:
                logger.info("--resume: no checkpoint found, starting fresh")
                return
            restored = self.checkpointer.restore(jax.device_get(self.state))
            self.state = jax.device_put(restored, self._repl)
            logger.info("resumed from step %d", int(self.state.step))

    # ------------------------------------------------------------------
    def train(self, max_iter: Optional[int] = None):
        cfg = self.cfg
        max_iter = max_iter or cfg.SOLVER.MAX_ITER
        # process-INVARIANT rng: under pjit/GSPMD the train step is ONE global
        # program, so every host must feed identical replicated inputs — XLA
        # partitions the global dropout/AIM randomness across devices by
        # itself. (The reference seeds per-rank, siamese_planeTR.py:51,
        # because DDP runs N separate programs; doing that here would make
        # hosts silently compute divergent gradients.)
        rng = jax.random.PRNGKey(cfg.SEED)
        metrics_path = os.path.join(cfg.OUTPUT_DIR, "metrics.json")
        tb = None
        if cfg.get("TENSORBOARD_ON", True) and jax.process_index() == 0:
            from ..utils.tb_writer import TBScalarWriter

            tb = TBScalarWriter(cfg.OUTPUT_DIR)
        start = int(self.state.step)
        if start == 0 and jax.process_index() == 0:
            # fresh run: truncate any stale metrics from a previous run in
            # the same OUTPUT_DIR (resume keeps appending, d2 semantics)
            open(metrics_path, "w").close()
        t0 = time.time()
        last_log = None
        if self._loader is None:
            self._loader = self._build_train_loader()
        it = iter(self._loader)
        for step in range(start, max_iter):
            batch = next(it)
            batch.pop("meta", None)
            batch = shard_batch(batch, self.mesh)
            if step == start and jax.process_count() > 1:
                # bound the cross-host compile skew entering the first
                # global collective (parallel/mesh.staggered_compile)
                self.train_step = staggered_compile(
                    self.train_step, self.state, batch, rng)
            self.state, metrics = self.train_step(self.state, batch, rng)

            if jax.process_index() == 0 and (step % 20 == 0 or step == max_iter - 1):
                m = {k: float(v) for k, v in jax.device_get(metrics).items()}
                m["iteration"] = step
                # cumulative average (includes the initial compile) ...
                m["time_per_iter"] = (time.time() - t0) / max(step - start + 1, 1)
                # ... and the steady-state rate since the previous log line,
                # which is what throughput comparisons should read
                now = time.time()
                if last_log is not None:
                    last_step, last_t = last_log
                    m["time_per_iter_recent"] = (now - last_t) / max(step - last_step, 1)
                last_log = (step, now)
                with open(metrics_path, "a") as f:
                    f.write(json.dumps(m) + "\n")
                if tb is not None:
                    tb.add_scalars(m, step=step)
                logger.info("iter %d total %.4f", step, m.get("total_loss", -1))

            if (step + 1) % cfg.SOLVER.CHECKPOINT_PERIOD == 0:
                self.checkpointer.save(self.state, step + 1)
            if cfg.TEST.EVAL_PERIOD > 0 and (step + 1) % cfg.TEST.EVAL_PERIOD == 0:
                try:
                    # d2 PreciseBN hook semantics: recompute running stats
                    # before EVERY eval, not only the final one — mid-train
                    # evals otherwise use stats lagging the params by
                    # ~1/(1-momentum) steps (see engine/precise_bn.py)
                    if cfg.TEST.PRECISE_BN.ENABLED:
                        self.state = self._precise_bn(self.state)
                    res = self.test()
                    # persist eval results next to the training losses (the
                    # reference's EventStorage writes eval scalars into
                    # metrics.json the same way)
                    if jax.process_index() == 0 and res:
                        row = {"iteration": step, "eval": _flatten_metrics(res)}
                        with open(metrics_path, "a") as f:
                            f.write(json.dumps(row) + "\n")
                        if tb is not None:
                            tb.add_scalars(
                                {f"eval/{k}": v
                                 for k, v in row["eval"].items()}, step=step)
                except Exception as e:  # eval must not kill training
                    logger.warning("eval failed: %s", e)
        if cfg.TEST.PRECISE_BN.ENABLED:
            self.state = self._precise_bn(self.state)
            self.checkpointer.save(self.state, max_iter)  # overwrite periodic
        self.checkpointer.save(self.state, max_iter, name="model_final")
        if tb is not None:
            tb.close()
        return self.state

    def _precise_bn(self, state):
        """Recompute BN statistics with frozen params (TEST.PRECISE_BN)."""
        from .precise_bn import recompute_batch_stats

        if not jax.tree_util.tree_leaves(state.batch_stats):
            return state
        logger.info("precise-BN: recomputing batch statistics over <=%d batches",
                    self.cfg.TEST.PRECISE_BN.NUM_ITER)
        if self._loader is None:
            self._loader = self._build_train_loader()

        def batches():
            it = iter(self._loader)
            for _ in range(self.cfg.TEST.PRECISE_BN.NUM_ITER):
                b = next(it, None)
                if b is None:
                    return
                yield b

        new_bs = recompute_batch_stats(
            self.model, state.params, state.batch_stats, batches(),
            num_iter=self.cfg.TEST.PRECISE_BN.NUM_ITER)
        # keep every state leaf on the mesh-replicated sharding (mixed
        # placements retrigger train-step specialisation, see __init__)
        return state.replace(batch_stats=jax.device_put(new_bs, self._repl))

    # ------------------------------------------------------------------
    def test(self, dataset_list: Optional[List[dict]] = None, max_pairs: Optional[int] = None):
        from ..evaluation.evaluator import MP3DEvaluator
        from ..evaluation.postprocess import postprocess_batch

        cfg = self.cfg
        test_name = cfg.DATASETS.TEST[0]
        if dataset_list is None:
            dataset_list = DatasetCatalog.get(test_name)
        if max_pairs:
            dataset_list = dataset_list[:max_pairs]
        if jax.process_count() > 1:
            # distributed eval: each host evaluates a distinct slice; the
            # evaluator's host_gather merges (reference shards the test
            # loader per rank and comm.gathers, mp3d_evaluation.py:317-319)
            dataset_list = dataset_list[jax.process_index()::jax.process_count()]
        mapper = PairMapper(
            is_train=False, dataset_kind=_dataset_kind(test_name),
            root_dir=cfg.DATASETS.ROOT_DIR, image_size=self.image_hw,
            num_queries=cfg.MODEL.SEM_SEG_HEAD.NUM_OBJECT_QUERIES,
            pixel_mean=cfg.MODEL.PIXEL_MEAN, pixel_std=cfg.MODEL.PIXEL_STD,
            # uint8 transport + in-graph normalisation: bit-equal, 4x fewer
            # host->device bytes (see make_eval_step / PERF.md round 5)
            raw_uint8=True,
            camera_cls_on=cfg.MODEL.CAMERA_HEAD.CLASSIFICATION_ON,
            # TEST.EVAL_GT_BOX: the mapper ATTACHES GT targets at eval time,
            # exactly the reference's behavior (planercnn_transforms.py:
            # 276-305 attaches `instances`; the reference's eval path does
            # not consume them downstream either — attachment parity only)
            eval_gt_box=bool(cfg.TEST.EVAL_GT_BOX),
        )
        # distributed=True under multi-host: each host processed only its
        # dataset slice above, so evaluate() must host_gather the
        # predictions and share the merged metrics (reference: per-rank
        # test loader + comm.gather, mp3d_evaluation.py:317-319). Was
        # silently False before round 5 — every host computed metrics on
        # its own slice only (caught by the 2-process mid-train eval test).
        evaluator = MP3DEvaluator(test_name, cfg, dataset_list=dataset_list,
                                  distributed=jax.process_count() > 1)
        h, w = self.image_hw

        # GT-matcher pose refinement ablation (camera_head.py:520-547)
        use_gt_matcher = bool(cfg.TEST.POSE_REFINEMENT_WITH_GT_MATCHERS)
        noise_rng = None
        if use_gt_matcher:
            logger.warning("using GT plane matches for pose refinement")
            if cfg.TEST.POSE_REFINEMENT_WITH_GT_NOISE_MATCHERS:
                logger.warning("...with Gaussian noise on the GT planes")
                noise_rng = np.random.default_rng(cfg.SEED if cfg.SEED >= 0 else 0)
        # SP top-1-camera substitution (camera_head.py:44-59, 419-431): the
        # host loads the SparsePlanes pickle once and looks up each pair's
        # initial pose by "<image_id1>-<image_id2>"; the jitted graph skips
        # the PixelCameraHead and refines from the substituted pose.
        sp_topcam = None
        if bool(cfg.MODEL.CAMERA_HEAD.get("INFERENCE_SP_TOPCAM_ON", False)):
            if not bool(cfg.MODEL.CAMERA_HEAD.CAM_REC_ON):
                raise ValueError(
                    "INFERENCE_SP_TOPCAM_ON requires CAMERA_HEAD.CAM_REC_ON "
                    "(reference camera_head.py:469)")
            logger.warning("Note: using top1 cam")
            import pickle
            with open(cfg.MODEL.CAMERA_HEAD.INFERENCE_SP_TOPCAM_PATH, "rb") as f:
                sp_topcam = pickle.load(f)
        bs = int(cfg.TEST.IMS_PER_BATCH)
        # Local data-parallel eval (round 5): shard the eval batch over this
        # host's devices (as many as divide TEST.IMS_PER_BATCH). Eval stays a
        # per-host LOCAL program in every configuration — multi-host runs
        # keep their per-host dataset slices and merge via host_gather — but
        # a multi-chip host no longer idles all chips but one. d == 1
        # reproduces the old single-device behaviour exactly.
        import math as _math

        d = _math.gcd(bs, jax.local_device_count())
        eval_mesh = make_mesh(d, local=True)
        eval_repl = NamedSharding(eval_mesh, P())
        eval_bsh = NamedSharding(eval_mesh, P("data"))

        key = (use_gt_matcher, sp_topcam is not None, h, w, d)
        if getattr(self, "_eval_steps", None) is None:
            self._eval_steps = {}
        if key not in self._eval_steps:
            self._eval_steps[key] = jax.jit(make_eval_step(
                self.model, out_h=h, out_w=w, with_gt_geo=use_gt_matcher,
                with_init_cam=sp_topcam is not None,
                pixel_mean=cfg.MODEL.PIXEL_MEAN,
                pixel_std=cfg.MODEL.PIXEL_STD))
        eval_step = self._eval_steps[key]
        variables = {"params": self.state.params, "batch_stats": self.state.batch_stats}
        # Re-home the state onto the local eval mesh (always: the train
        # state may be committed to a different/larger mesh than the eval
        # batch's, and mixing committed shardings in one jit raises
        # incompatible-devices). Multi-host: the state lives on the GLOBAL
        # cross-process mesh while eval inputs are host-local and each host
        # loops over a different-length dataset slice (a global program
        # with per-host iteration counts would deadlock), so hop through
        # host memory; only evaluator.evaluate()'s host_gather crosses
        # processes. Single-host: a direct device_put reshard suffices.
        if jax.process_count() > 1:
            variables = jax.device_put(jax.device_get(variables), eval_repl)
        else:
            variables = jax.device_put(variables, eval_repl)
        # one-step software pipeline: jax dispatch is async, so enqueueing
        # batch i+1 BEFORE fetching/postprocessing batch i overlaps the host
        # half (RLE, instance assembly, metric accumulation) with device
        # compute instead of strictly alternating them
        pending = None

        def _drain(p):
            pchunk, pmetas, fut = p
            out = jax.device_get(fut)
            results = postprocess_batch(out, pmetas, height=h, width=w)
            evaluator.process(pchunk, results)

        # cfg.DEBUG_CAMERA_ON: per-iteration progress marker, matching the
        # reference's print in inference (siamese_planeTR.py:343-344).
        # cfg.DEBUG_ON is parity-inert: the reference stores it on the
        # evaluator (mp3d_evaluation.py:62) and never reads it again.
        debug_camera = bool(cfg.get("DEBUG_CAMERA_ON", False))
        debug_iter = 0
        t_loop0 = time.perf_counter()
        def _put(stacked):
            return jax.device_put(jnp.asarray(stacked), eval_bsh)

        for lo in range(0, len(dataset_list), bs):
            chunk = dataset_list[lo: lo + bs]
            debug_iter += 1
            if debug_camera:
                print("**********************> ", debug_iter, flush=True)
            samples = [mapper(d) for d in chunk]
            n_real = len(samples)
            # pad the tail chunk to the fixed batch size (repeat the last
            # sample): keeps ONE compiled eval graph for every batch (no
            # tail-shape retrace) and keeps the batch divisible by the
            # eval mesh; padded rows are dropped before postprocess
            samples = samples + [samples[-1]] * (bs - n_real)
            img0 = _put(np.stack([s["image0"] for s in samples]))
            img1 = _put(np.stack([s["image1"] for s in samples]))
            pad_chunk = list(chunk) + [chunk[-1]] * (bs - n_real)
            extra = []
            if use_gt_matcher:
                gt_geo = gt_geo_from_samples(
                    pad_chunk, samples, self.model.num_queries, noise_rng=noise_rng,
                    scale_offset=cfg.TEST.POSE_REFINEMENT_WITH_GT_NOISE_MATCHERS_OFFSET_SCALE,
                    scale_normal_deg=cfg.TEST.POSE_REFINEMENT_WITH_GT_NOISE_MATCHERS_NORMAL_SCALE,
                )
                extra.append({k: _put(v) for k, v in gt_geo.items()})
            if sp_topcam is not None:
                # KeyError on a missing pair matches the reference's direct
                # dict indexing (camera_head.py:424)
                cams = [sp_topcam[d["0"]["image_id"] + "-" + d["1"]["image_id"]]
                        for d in pad_chunk]
                extra.append({
                    "tran": _put(np.stack(
                        [np.asarray(c["position"], np.float32).reshape(3)
                         for c in cams])),
                    "rot": _put(np.stack(
                        [np.asarray(c["rotation"], np.float32).reshape(4)
                         for c in cams])),
                })
            fut = eval_step(variables, img0, img1, *extra)
            if pending is not None:
                _drain(pending)
            # metas sliced to the real rows: postprocess iterates len(metas)
            pending = (chunk, [s["meta"] for s in samples[:n_real]], fut)
        if pending is not None:
            _drain(pending)
        # end-to-end pipeline rate over the inference loop: host mapping +
        # device compute + host postprocess (RLE, instance assembly, metric
        # accumulation), overlapped by the one-step software pipeline above.
        # Excludes evaluate()'s one-time epilogue and, on a warm trainer
        # (cached eval_step jit), compile. bench.py reports this as
        # pipeline_pairs_per_sec (round-5 verdict item 2).
        t_loop = time.perf_counter() - t_loop0
        self.last_eval_stats = {
            "pairs": len(dataset_list),
            "seconds": round(t_loop, 3),
            "pairs_per_sec": round(len(dataset_list) / max(t_loop, 1e-9), 2),
        }
        return evaluator.evaluate()
