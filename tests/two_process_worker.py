"""Worker for test_two_process.py: one of two jax.distributed CPU processes.

Exercises the THREE multi-host behaviours the single-process suite can't
(SURVEY.md section 2.2; reference: per-rank DDP + comm.gather,
mp3d_evaluation.py:317-319):

  1. host_gather.all_gather_objects across a real process boundary
     (different-sized pickled payloads per rank);
  2. the full jitted train step over a mesh SPANNING both processes, with
     each host feeding only its local PairLoader slice of the global batch
     (parallel/mesh.py shard_batch -> make_array_from_process_local_data);
  3. replicated-output agreement: both hosts must fetch the identical loss.

Launched by the test with: python two_process_worker.py <pid> <port> <out>
[mode [shared_out_dir]].  mode "step" (default) runs the three phases above;
mode "trainer" runs the full Trainer with TEST.EVAL_PERIOD=1 so the
MID-TRAIN eval path executes under 2 processes — the state lives on the
global cross-process mesh and test() must re-home it onto a process-local
mesh (trainer.py re-homing; round-4 advisor bug, round-5 verdict item 5).
"""
import json
import os
import sys


def main() -> None:
    pid, port, out_path = int(sys.argv[1]), sys.argv[2], sys.argv[3]
    mode = sys.argv[4] if len(sys.argv) > 4 else "step"
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    sys.path.insert(0, repo)

    flags = os.environ.get("XLA_FLAGS", "")
    flags = " ".join(f for f in flags.split()
                     if "xla_force_host_platform_device_count" not in f)
    # 2 virtual devices per process -> 4 global; generous collective
    # timeouts: 4 virtual devices + 2 processes timeslice ONE physical core.
    # The deterministic-scheduler flag is NOT set here: the production
    # initialize_distributed() must inject it (parallel/mesh.py), and this
    # worker exists to prove the production path works.
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=2"
        " --xla_cpu_collective_call_warn_stuck_timeout_seconds=120"
        " --xla_cpu_collective_call_terminate_timeout_seconds=600").strip()
    os.environ["NOPESAC_SCAN_UNROLL"] = "1"

    import jax

    jax.config.update("jax_platforms", "cpu")  # sitecustomize overrides env
    # per-machine cache subdir: if one worker loads a stale AOT executable
    # from a different build host while the other compiles fresh, the two
    # processes run DIFFERENT collective schedules and gloo aborts with
    # "Received data size doesn't match expected size" (observed; see
    # utils/jax_cache.py)
    from nopesac_tpu.utils.jax_cache import cpu_cache_dir

    jax.config.update("jax_compilation_cache_dir", cpu_cache_dir(repo))
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    from nopesac_tpu.parallel.mesh import initialize_distributed

    initialize_distributed(coordinator_address=f"localhost:{port}",
                           num_processes=2, process_id=pid)
    assert "concurrency_optimized_scheduler=false" in os.environ["XLA_FLAGS"]
    assert jax.process_count() == 2
    assert jax.device_count() == 4, jax.devices()
    assert jax.local_device_count() == 2

    if mode == "trainer":
        _trainer_mode(pid, out_path, sys.argv[5])
        return

    import numpy as np
    import jax.numpy as jnp

    from nopesac_tpu.parallel.host_gather import all_gather_objects

    # ---- 1. cross-process object gather (ragged payloads)
    objs = all_gather_objects({"rank": pid, "payload": "x" * (10 + pid * 1000)})
    assert [o["rank"] for o in objs] == [0, 1], objs
    assert len(objs[1]["payload"]) == 1010

    # ---- 2. full train step over the cross-process mesh
    from nopesac_tpu.config.config import get_cfg
    from nopesac_tpu.data.loader import PairLoader
    from nopesac_tpu.data.mapper import PairMapper
    from nopesac_tpu.data.synthetic import make_dataset
    from nopesac_tpu.engine.optimizer import apply_freeze, build_optimizer
    from nopesac_tpu.engine.train_step import (
        create_train_state, jit_train_step, make_train_step,
    )
    from nopesac_tpu.models.nopesac import PlaneTRNopeSAC
    from nopesac_tpu.parallel.mesh import make_mesh, replicated, shard_batch

    h, w, nq, global_bs = 64, 96, 16, 4
    model = PlaneTRNopeSAC(sinkhorn_iterations=10, num_queries=nq, rand_bs=4)

    # both hosts build the same dataset; the loader shards it per process and
    # yields LOCAL batches of global_bs / 2 (engine/trainer.py semantics)
    data = make_dataset(n_pairs=8, n_planes=4, h=h, w=w, seed=3)
    mapper = PairMapper(is_train=True, dataset_kind="mp3d",
                        image_size=(h, w), num_queries=nq)
    loader = PairLoader(data, mapper, batch_size=global_bs // 2,
                        shuffle=True, drop_last=True, seed=5,
                        num_shards=2, shard_id=pid, infinite=True)
    local_batch = next(iter(loader))
    local_batch.pop("meta", None)
    assert local_batch["image0"].shape[0] == global_bs // 2

    init_batch = jax.tree_util.tree_map(
        lambda x: jnp.asarray(np.concatenate([x, x], axis=0)), local_batch)
    variables = jax.jit(lambda b: model.init(
        {"params": jax.random.PRNGKey(0), "dropout": jax.random.PRNGKey(1)},
        b, jax.random.PRNGKey(2), method=model.train_forward,
    ))(init_batch)

    cfg = get_cfg()
    tx = apply_freeze(build_optimizer(cfg, variables["params"]),
                      variables["params"])
    state = create_train_state(variables["params"],
                               variables.get("batch_stats", {}), tx)

    mesh = make_mesh()  # all 4 devices, both processes
    assert mesh.devices.size == 4
    step = jit_train_step(make_train_step(model, tx), mesh)
    state = jax.device_put(state, replicated(mesh))
    gbatch = shard_batch(local_batch, mesh)
    assert gbatch["image0"].shape[0] == global_bs  # local slices -> global
    rng = jax.device_put(jax.random.PRNGKey(7), replicated(mesh))

    # Both ranks compile the same HLO with the deterministic scheduler
    # (injected by initialize_distributed) so the collective order matches;
    # staggered_compile bounds the cross-rank compile skew entering the
    # first 4-device gloo clique init — both mitigations now live in the
    # PRODUCTION parallel/mesh.py (this worker proves that path).
    # Executable SHIPPING (jax.experimental.serialize_executable) does not
    # work here: XLA:CPU deserialization fails with "Function <...>_fusion
    # not found", and the persistent cache can't dedupe either (its key is
    # process-dependent: rank 0 was observed loading 4 AOT entries while
    # rank 1 loaded none for identical code).
    from nopesac_tpu.parallel.mesh import staggered_compile

    compiled = staggered_compile(step, state, gbatch, rng)
    state, metrics = compiled(state, gbatch, rng)
    total = float(metrics["total_loss"])
    assert np.isfinite(total), total

    # ---- 3. replicated outputs must agree bit-for-bit across hosts
    totals = all_gather_objects(total)
    assert totals[0] == totals[1], totals

    with open(out_path, "w") as f:
        json.dump({"ok": True, "total_loss": total,
                   "step": int(state.step)}, f)


def _trainer_mode(pid: int, out_path: str, out_dir: str) -> None:
    """Full Trainer under 2 processes with TEST.EVAL_PERIOD=1: one global-mesh
    train step, then the mid-train eval (global-mesh state re-homed onto a
    process-local mesh, per-host dataset slice, host_gather metric merge)."""
    import nopesac_tpu.data.datasets  # noqa: F401  (registers synthetic)
    from nopesac_tpu.config.config import get_cfg
    from nopesac_tpu.engine.trainer import Trainer

    cfg = get_cfg()
    cfg.DATASETS.TRAIN = ("synthetic_train",)
    cfg.DATASETS.TEST = ("synthetic_test",)
    cfg.MODEL.EMBEDDING_ON = True
    cfg.MODEL.CAMERA_ON = True
    cfg.MODEL.CAMERA_HEAD.NAME = "PlaneCameraHead"
    cfg.MODEL.CAMERA_HEAD.REFINE_ON = True
    cfg.MODEL.CAMERA_HEAD.CAM_REC_ON = True
    cfg.MODEL.SEM_SEG_HEAD.PARAM_ON = True
    cfg.MODEL.SEM_SEG_HEAD.CENTER_ON = True
    cfg.MODEL.SEM_SEG_HEAD.NUM_OBJECT_QUERIES = 16
    cfg.MODEL.MATCHING_HEAD.SINKHORN_ITERS = 10
    cfg.SOLVER.IMS_PER_BATCH = 4   # 2 per host over the 4-device global mesh
    cfg.SOLVER.MAX_ITER = 1
    cfg.SOLVER.CHECKPOINT_PERIOD = 100
    cfg.TEST.EVAL_PERIOD = 1       # fire the mid-train eval on step 1
    cfg.TEST.IMS_PER_BATCH = 2
    cfg.OUTPUT_DIR = out_dir       # shared: rank 0 alone writes artifacts
    cfg.freeze()

    def mark(msg):
        print(f"[worker {pid}] {msg}", flush=True)

    mark("building trainer")
    trainer = Trainer(cfg, image_hw=(96, 128))
    mark("trainer built; training")
    trainer.train()
    mark("train done (incl. mid-train eval); running direct test()")

    # the mid-train eval row must exist (rank 0 writes it; an eval failure
    # is swallowed by the train loop's try/except, so its absence IS the
    # regression signal) — checked by the parent test on rank 0's files.
    # Both ranks also run test() directly: the evaluator's host_gather merge
    # must hand BOTH processes identical merged metrics.
    res = trainer.test()
    mark("direct test done; writing result")
    with open(out_path, "w") as f:
        json.dump({"ok": True,
                   "r_median": float(res["R median err"]),
                   "t_median": float(res["T median err"]),
                   "mask_ap": float(res["mask_ap@0.5"])}, f)
    # release the train loader's worker pool BEFORE interpreter teardown:
    # a live spawn pool at exit makes this rank's shutdown minutes slower
    # than its peer's (pool/semaphore cleanup), tripping jax.distributed's
    # 5-minute shutdown barrier
    if trainer._loader is not None:
        trainer._loader.close()
    mark("loader closed; exiting")


if __name__ == "__main__":
    main()
