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
import time

import numpy as np

REFERENCE_PAIRS_PER_SEC = 10.0  # assumed reference GPU single-stream rate


def main():
    import jax
    import jax.numpy as jnp

    from nopesac_tpu.models.nopesac import PlaneTRNopeSAC

    h, w = 480, 640
    batch = 8
    dtype = jnp.bfloat16

    model = PlaneTRNopeSAC(dtype=dtype)
    rng = np.random.default_rng(0)
    img0 = jnp.asarray(rng.normal(size=(batch, h, w, 3)).astype(np.float32))
    img1 = jnp.asarray(rng.normal(size=(batch, h, w, 3)).astype(np.float32))

    variables = jax.jit(
        lambda a, b: model.init(
            {"params": jax.random.PRNGKey(0), "dropout": jax.random.PRNGKey(1)},
            a, b, method=model.inference, out_h=h, out_w=w,
        )
    )(img0[:1], img1[:1])

    @jax.jit
    def infer(i0, i1):
        out = model.apply(variables, i0, i1, method=model.inference, out_h=h, out_w=w)
        cam = out["cameras"]["camera"]
        return cam["tran"], cam["rot"], out["view0"]["valid"], out["assignment"]

    # warmup / compile
    res = infer(img0, img1)
    jax.block_until_ready(res)

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
