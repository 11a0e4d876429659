#!/usr/bin/env python
"""Micro-bench: NOPE-SAC refine() fwd+bwd standalone (PERF.md candidate
"fuse the refine zoo's per-branch head MLPs into one batched matmul").

Times the refine subgraph (camera_head.py:737-923 spec) in isolation at the
production train shapes so a sub-ms fusion win is measurable at all: the
full-step bench's tunnel noise (~2 ms) swamps it. Chained like bench.py
(each call consumes the previous call's output) so remote backends cannot
overlap or cache calls.

Usage: python tools/bench_refine.py [--batch 16] [--iters 200]
"""
from __future__ import annotations

import argparse
import sys
import time

import numpy as np

import jax
import jax.numpy as jnp


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=16)
    ap.add_argument("--m", type=int, default=50, help="match-sequence length")
    ap.add_argument("--iters", type=int, default=200)
    args = ap.parse_args()

    sys.path.insert(0, ".")
    from nopesac_tpu.models.camera_head import PlaneCameraHead

    b, m = args.batch, args.m
    head = PlaneCameraHead(num_queries=m, dtype=jnp.bfloat16)
    rng = np.random.default_rng(0)

    def mk(shape, scale=1.0):
        return jnp.asarray(rng.normal(size=shape).astype(np.float32) * scale)

    inputs = dict(
        initial_trans_feat=mk((b, 256)),
        initial_rot_feat=mk((b, 256)),
        initial_trans=mk((b, 3)),
        initial_rot=mk((b, 4)),
        geo_local=mk((b, m, 6)),
        seq_valid=jnp.asarray(rng.random((b, m)) < 0.5),
        sig_seq=jnp.sign(mk((b, m, 1))) ,
        geo_global=mk((b, m, 6)),
    )

    def fwd(variables, inp):
        out = head.apply(variables, method=head.refine, clamp_scores=True, **inp)
        return (out["tran_soft"].astype(jnp.float32).sum()
                + out["rot_soft"].astype(jnp.float32).sum()
                + out["score_rot"].astype(jnp.float32).sum())

    variables = head.init(jax.random.PRNGKey(0), method=head.refine,
                          clamp_scores=True, **inputs)

    @jax.jit
    def step(variables, inp, feedback):
        inp = dict(inp, initial_trans=inp["initial_trans"] + feedback)
        loss, grads = jax.value_and_grad(fwd)(variables, inp)
        gsum = sum(jnp.sum(g.astype(jnp.float32))
                   for g in jax.tree_util.tree_leaves(grads))
        return (loss + gsum) * jnp.asarray(1e-20, jnp.float32)

    fb = jnp.asarray(0.0, jnp.float32)
    t0 = time.time()
    fb = step(variables, inputs, fb)
    _ = float(fb)
    print(f"[refine] compile+warmup {time.time()-t0:.1f}s", file=sys.stderr)

    trivial = jax.jit(lambda x: x + 1.0)
    _ = float(trivial(fb))
    t0 = time.perf_counter()
    for _ in range(5):
        _ = float(trivial(fb))
    rtt = (time.perf_counter() - t0) / 5

    t0 = time.perf_counter()
    for _ in range(args.iters):
        fb = step(variables, inputs, fb)
    assert np.isfinite(float(fb))
    dt = time.perf_counter() - t0 - rtt
    print(f"[refine] fwd+bwd {dt/args.iters*1e3:.3f} ms/call "
          f"(bs={b}, M={m}, {args.iters} chained iters, rtt {rtt*1e3:.1f} ms)")


if __name__ == "__main__":
    main()
