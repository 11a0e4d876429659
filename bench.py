#!/usr/bin/env python
"""Benchmark: MP3D pair inference throughput on one chip.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.

Baseline note: the reference repo measures no throughput (inference is
enforced bs=1 single-stream, siamese_planeTR.py:340). BASELINE.md records
the driver target as >= 10x the reference GPU pairs/sec/chip; we take the
reference single-GPU single-stream rate as ~10 pairs/sec (ResNet-50 + 12
transformer layers + 18 GNN layers + 200 Sinkhorn iterations at bs=1) and
report vs_baseline against that.
"""
import json
import os
import sys
import time

import numpy as np

REFERENCE_PAIRS_PER_SEC = 10.0  # assumed reference GPU single-stream rate


def _t(msg, t0):
    print(f"[bench] {msg}: {time.time() - t0:.1f}s", file=sys.stderr, flush=True)
    return time.time()


def main():
    import jax

    # persistent compilation cache: the heavy XLA compile (single host core)
    # happens once; subsequent bench runs start in seconds
    cache_dir = os.path.join(os.path.dirname(os.path.abspath(__file__)), ".jax_cache")
    jax.config.update("jax_compilation_cache_dir", cache_dir)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    import jax.numpy as jnp

    from nopesac_tpu.models.nopesac import PlaneTRNopeSAC

    h, w = 480, 640
    batch = 8
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
            out["view0"]["seg_ids"].sum().astype(jnp.float32) + out["view0"]["gate"].sum().astype(jnp.float32),
            out["view1"]["seg_ids"].sum().astype(jnp.float32) + out["view1"]["gate"].sum().astype(jnp.float32),
            out["view0"]["score"].sum(), out["view1"]["score"].sum(),
            out["view0"]["params"].sum(), out["view1"]["params"].sum(),
            out["view0"]["centers"].sum(), out["assignment"].sum(),
        ]
        fb = sum(p.astype(jnp.float32) for p in parts)
        return fb * jnp.asarray(1e-20, jnp.float32)

    # warmup / compile
    fb = jnp.asarray(0.0, jnp.float32)
    fb = infer(variables, img0, img1, fb)
    _ = float(fb)
    t0 = _t("bs=8 compile + warmup", t0)

    # measure the tunnel round-trip to subtract it from the chain total
    trivial = jax.jit(lambda x: x + 1.0)
    _ = float(trivial(fb))
    t0 = time.perf_counter()
    for _i in range(5):
        _ = float(trivial(fb))
    rtt = (time.perf_counter() - t0) / 5

    iters = 30
    t0 = time.perf_counter()
    for i in range(iters):
        fb = infer(variables, img0, img1, fb)
    assert np.isfinite(float(fb))  # forces the whole chain
    dt = time.perf_counter() - t0 - rtt

    pairs_per_sec = batch * iters / dt
    print(f"[bench] rtt={rtt*1e3:.1f}ms chain={dt:.3f}s "
          f"per-call={dt/iters*1e3:.2f}ms", file=sys.stderr, flush=True)
    print(json.dumps({
        "metric": "mp3d_pair_inference_throughput",
        "value": round(pairs_per_sec, 2),
        "unit": "pairs/sec/chip",
        "vs_baseline": round(pairs_per_sec / REFERENCE_PAIRS_PER_SEC, 2),
    }))


if __name__ == "__main__":
    main()
