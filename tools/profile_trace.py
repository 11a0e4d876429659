#!/usr/bin/env python
"""Capture + summarise a TPU profiler trace of a jitted callable.

Usage:
    python tools/profile_trace.py [--what infer|train] [--batch 8] [--iters 5]

Prints the leaf XLA ops grouped by op family (fusion kind) with per-call
device time, plus the biggest individual ops with their HLO long names —
the fastest way to see where a step's time actually goes.
"""
import argparse
import collections
import glob
import gzip
import json
import os
import re
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def summarize(trace_dir: str, iters: int, top: int = 15):
    tr = sorted(glob.glob(os.path.join(trace_dir, "plugins/profile/*/*.trace.json.gz")))[-1]
    with gzip.open(tr) as fh:
        data = json.load(fh)
    events = data["traceEvents"]
    names = {e["pid"]: e["args"].get("name", "") for e in events
             if e.get("ph") == "M" and e.get("name") == "process_name"}
    tid_names = {(e["pid"], e["tid"]): e["args"].get("name", "") for e in events
                 if e.get("ph") == "M" and e.get("name") == "thread_name"}
    agg = collections.Counter()
    big = {}
    total = 0
    for e in events:
        if e.get("ph") != "X":
            continue
        if "TPU" not in names.get(e.get("pid"), ""):
            continue
        if "XLA Ops" not in tid_names.get((e.get("pid"), e.get("tid")), ""):
            continue
        n = e["name"]
        if n.startswith("jit_"):
            continue
        fam = re.sub(r"[.\d]+$", "", n)
        agg[fam] += e.get("dur", 0)
        total += e.get("dur", 0)
        if e.get("dur", 0) > big.get(n, (0, ""))[0]:
            big[n] = (e.get("dur", 0),
                      str(e.get("args", {}).get("long_name", ""))[:140])
    print(f"total leaf-op device time: {total/iters/1000:.2f} ms per call")
    for n, d in agg.most_common(top):
        print(f"{d/iters/1000:8.3f} ms  {n}")
    print("--- biggest single ops:")
    for n, (d, ln) in sorted(big.items(), key=lambda kv: -kv[1][0])[:top]:
        print(f"{d/iters/1000:7.3f}ms {n[:36]:38s} {ln}")


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--what", default="infer", choices=["infer", "train"])
    ap.add_argument("--batch", type=int, default=8)
    ap.add_argument("--iters", type=int, default=5)
    ap.add_argument("--out", default="/tmp/nopesac_trace")
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp
    jax.config.update("jax_compilation_cache_dir",
                      os.path.join(os.path.dirname(os.path.dirname(
                          os.path.abspath(__file__))), ".jax_cache"))
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    from nopesac_tpu.models.nopesac import PlaneTRNopeSAC

    H, W, B = 480, 640, args.batch
    rng = np.random.default_rng(0)
    img0 = jnp.asarray(rng.normal(size=(B, H, W, 3)).astype(np.float32))
    img1 = jnp.asarray(rng.normal(size=(B, H, W, 3)).astype(np.float32))

    if args.what == "infer":
        model = PlaneTRNopeSAC(dtype=jnp.bfloat16)
        variables = jax.jit(lambda a, b: model.init(
            {"params": jax.random.PRNGKey(0), "dropout": jax.random.PRNGKey(1)},
            a, b, method=model.inference, out_h=H, out_w=W))(img0[:1], img1[:1])

        @jax.jit
        def step(v, a, b, fb):
            # fb chains each call on the previous result: the axon remote
            # backend caches identical (program, args) executions, which
            # would leave the trace with fewer real runs than --iters
            out = model.apply(v, a + fb, b, method=model.inference,
                              out_h=H, out_w=W)
            return out["cameras"]["camera"]["tran"].sum() * 1e-20
    else:
        from nopesac_tpu.engine.trainer import Trainer  # noqa: F401 (build path)
        from tests.test_model_smoke import make_batch  # reuse the batch builder
        model = PlaneTRNopeSAC(dtype=jnp.bfloat16)
        batch = make_batch(np.random.default_rng(0), b=B, h=H, w=W)
        # init MUST be jitted: an eager init op-by-op through the axon
        # tunnel is one network round trip per HLO op (>15 min for the
        # train graph vs seconds jitted)
        variables = jax.jit(lambda bt: model.init(
            {"params": jax.random.PRNGKey(0), "dropout": jax.random.PRNGKey(1)},
            bt, jax.random.PRNGKey(2), method=model.train_forward))(batch)

        @jax.jit
        def step(v, bt, fb):
            bt = dict(bt, image0=bt["image0"] + fb)
            def loss_fn(params):
                losses, _ = model.apply(
                    {"params": params, **{k: v2 for k, v2 in v.items() if k != "params"}},
                    bt, jax.random.PRNGKey(3), method=model.train_forward,
                    mutable=["batch_stats"], rngs={"dropout": jax.random.PRNGKey(4)})
                return sum(jnp.asarray(x).astype(jnp.float32) for x in losses.values())
            loss, grads = jax.value_and_grad(loss_fn)(v["params"])
            gn = sum(jnp.sum(jnp.square(g.astype(jnp.float32)))
                     for g in jax.tree_util.tree_leaves(grads))
            return (loss + gn) * 1e-20

    cargs = (variables, img0, img1) if args.what == "infer" else (variables, batch)
    fb = jnp.asarray(0.0, jnp.float32)
    fb = step(*cargs, fb)
    _ = float(fb)
    with jax.profiler.trace(args.out):
        for _ in range(args.iters):
            fb = step(*cargs, fb)
        _ = float(fb)  # forces the whole chain
    summarize(args.out, args.iters)


if __name__ == "__main__":
    main()
