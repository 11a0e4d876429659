#!/usr/bin/env python
"""Time nopesac_tpu inference on this host's CPU at the reference's setting
(bs=1, 480x640) for a hardware-identical comparison against
tools/bench_reference_cpu.py (torch CPU). Appends to reference_cpu_bench.json.
"""
from __future__ import annotations

import json
import os
import sys
import time

import numpy as np

_REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, _REPO)

import jax

jax.config.update("jax_platforms", "cpu")
from nopesac_tpu.utils.jax_cache import cpu_cache_dir  # noqa: E402

jax.config.update("jax_compilation_cache_dir", cpu_cache_dir(_REPO))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

import jax.numpy as jnp


def main():
    from nopesac_tpu.models.nopesac import PlaneTRNopeSAC

    h, w, pairs = 480, 640, 5
    model = PlaneTRNopeSAC()  # f32 on CPU (bf16 is emulated/slow off-TPU)
    rng = np.random.default_rng(0)
    img0 = jnp.asarray(rng.normal(size=(1, h, w, 3)).astype(np.float32))
    img1 = jnp.asarray(rng.normal(size=(1, h, w, 3)).astype(np.float32))

    variables = jax.jit(lambda a, b: model.init(
        {"params": jax.random.PRNGKey(0), "dropout": jax.random.PRNGKey(1)},
        a, b, method=model.inference, out_h=h, out_w=w))(img0, img1)
    jax.block_until_ready(variables)

    @jax.jit
    def infer(v, i0, i1, fb):
        out = model.apply(v, i0 + fb, i1, method=model.inference, out_h=h, out_w=w)
        cam = out["cameras"]["camera"]
        s = (cam["tran"].sum() + cam["rot"].sum()
             + out["view0"]["seg_gated"].astype(jnp.float32).sum()
             + out["assignment"].sum())
        return s.astype(jnp.float32) * 1e-20

    fb = jnp.asarray(0.0, jnp.float32)
    fb = infer(variables, img0, img1, fb)
    _ = float(fb)  # compile + warmup

    t0 = time.perf_counter()
    for _ in range(pairs):
        fb = infer(variables, img0, img1, fb)
    assert np.isfinite(float(fb))
    dt = time.perf_counter() - t0

    rec = {
        "ours_cpu_pairs_per_sec": round(pairs / dt, 3),
        "ours_cpu_seconds_per_pair": round(dt / pairs, 2),
        "ours_cpu_note": "same host CPU, bs=1 480x640, f32, XLA:CPU",
    }
    path = os.path.join(_REPO, "reference_cpu_bench.json")
    blob = {}
    if os.path.exists(path):
        with open(path) as f:
            blob = json.load(f)
    blob.update(rec)
    if "value" in blob and rec["ours_cpu_pairs_per_sec"]:
        blob["ours_vs_reference_same_cpu"] = round(
            rec["ours_cpu_pairs_per_sec"] / blob["value"], 2)
    with open(path, "w") as f:
        json.dump(blob, f, indent=1)
    print(json.dumps(blob))


if __name__ == "__main__":
    main()
