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

    @jax.jit
    def infer(i0, i1):
        out = model.apply(variables, i0, i1, method=model.inference, out_h=h, out_w=w)
        cam = out["cameras"]["camera"]
        return cam["tran"], cam["rot"], out["view0"]["valid"], out["assignment"]

    # warmup / compile
    res = infer(img0, img1)
    jax.block_until_ready(res)
    t0 = _t("bs=8 compile + warmup", t0)

    iters = 20
    t0 = time.perf_counter()
    for _ in range(iters):
        res = infer(img0, img1)
    jax.block_until_ready(res)
    dt = time.perf_counter() - t0

    pairs_per_sec = batch * iters / dt
    print(json.dumps({
        "metric": "mp3d_pair_inference_throughput",
        "value": round(pairs_per_sec, 2),
        "unit": "pairs/sec/chip",
        "vs_baseline": round(pairs_per_sec / REFERENCE_PAIRS_PER_SEC, 2),
    }))


if __name__ == "__main__":
    main()
