#!/usr/bin/env python
"""Micro-bench A/B: the 350-token encoder self-attention — materialized
softmax (production, models/transformer.py) vs the stock Pallas TPU
flash-attention kernel (PERF.md candidate).

Shapes: the DETR encoder runs 6 layers on [2B, 350, 256] (350 = 300 res5
tokens + 50 queries... strictly 300 context tokens at 15x20; see
SURVEY.md 3.1), 8 heads, head-dim 32. This times ONE attention core
(QK^T -> softmax -> AV) fwd+bwd both ways, with the flash path padded to
384 tokens + masked (the kernel wants 128-multiples).

Caveats recorded in PERF.md: the production training path applies dropout
to the ATTENTION WEIGHTS (reference parity, torch MultiheadAttention
semantics); the flash kernel cannot express that, so flash is only a
candidate for inference / dropout-free training.

Usage: python tools/bench_attention_ab.py [--batch 32] [--iters 100]
"""
from __future__ import annotations

import argparse
import functools
import sys
import time

import numpy as np

import jax
import jax.numpy as jnp


def timed(step, args_init, iters):
    fb = jnp.asarray(0.0, jnp.float32)
    t0 = time.time()
    fb = step(*args_init, fb)
    _ = float(fb)
    compile_s = time.time() - t0
    trivial = jax.jit(lambda x: x + 1.0)
    _ = float(trivial(fb))
    t0 = time.perf_counter()
    for _ in range(5):
        _ = float(trivial(fb))
    rtt = (time.perf_counter() - t0) / 5
    t0 = time.perf_counter()
    for _ in range(iters):
        fb = step(*args_init, fb)
    assert np.isfinite(float(fb))
    dt = time.perf_counter() - t0 - rtt
    return dt / iters * 1e3, compile_s


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=32,
                    help="2B for the siamese concat at train bs=16")
    ap.add_argument("--seq", type=int, default=350)
    ap.add_argument("--heads", type=int, default=8)
    ap.add_argument("--dh", type=int, default=32)
    ap.add_argument("--iters", type=int, default=100)
    args = ap.parse_args()
    b, s, h, dh = args.batch, args.seq, args.heads, args.dh

    rng = np.random.default_rng(0)
    q = jnp.asarray(rng.normal(size=(b, h, s, dh)).astype(np.float32),
                    dtype=jnp.bfloat16)
    k = jnp.asarray(rng.normal(size=(b, h, s, dh)).astype(np.float32),
                    dtype=jnp.bfloat16)
    v = jnp.asarray(rng.normal(size=(b, h, s, dh)).astype(np.float32),
                    dtype=jnp.bfloat16)

    scale = 1.0 / np.sqrt(dh)

    def naive_core(q, k, v):
        logits = jnp.einsum("bhld,bhsd->bhls", q, k) * scale
        attn = jax.nn.softmax(logits.astype(jnp.float32), axis=-1)
        return jnp.einsum("bhls,bhsd->bhld", attn.astype(jnp.bfloat16), v)

    def loss_of(core):
        def f(q, k, v):
            return core(q, k, v).astype(jnp.float32).sum()
        return f

    @jax.jit
    def naive_step(q, k, v, fb):
        q = q + fb.astype(q.dtype)
        l, gs = jax.value_and_grad(loss_of(naive_core), argnums=(0, 1, 2))(q, k, v)
        return (l + sum(g.astype(jnp.float32).sum() for g in gs)) * 1e-20

    naive_ms, naive_c = timed(naive_step, (q, k, v), args.iters)
    print(f"[attn] naive softmax fwd+bwd {naive_ms:.3f} ms "
          f"(compile {naive_c:.1f}s) [{b},{h},{s},{dh}]")

    try:
        from jax.experimental.pallas.ops.tpu.flash_attention import (
            BlockSizes, flash_attention,
        )

        pad = (-s) % 128
        sp = s + pad

        def flash_core(q, k, v):
            qp = jnp.pad(q, ((0, 0), (0, 0), (0, pad), (0, 0)))
            kp = jnp.pad(k, ((0, 0), (0, 0), (0, pad), (0, 0)))
            vp = jnp.pad(v, ((0, 0), (0, 0), (0, pad), (0, 0)))
            # mask padded keys via additive bias; padded queries discarded
            ab = jnp.zeros((b, h, sp, sp), jnp.float32).at[:, :, :, s:].set(-1e9)
            out = flash_attention(qp.astype(jnp.float32), kp.astype(jnp.float32),
                                  vp.astype(jnp.float32), ab=ab,
                                  sm_scale=scale, causal=False)
            return out[:, :, :s, :]

        @jax.jit
        def flash_step(q, k, v, fb):
            q = q + fb.astype(q.dtype)
            l, gs = jax.value_and_grad(loss_of(flash_core), argnums=(0, 1, 2))(q, k, v)
            return (l + sum(g.astype(jnp.float32).sum() for g in gs)) * 1e-20

        flash_ms, flash_c = timed(flash_step, (q, k, v), args.iters)
        print(f"[attn] pallas flash fwd+bwd {flash_ms:.3f} ms "
              f"(compile {flash_c:.1f}s, padded {s}->{sp})")
        print(f"[attn] delta per layer-call: {naive_ms - flash_ms:+.3f} ms "
              f"(x6 encoder layers = {(naive_ms - flash_ms) * 6:+.2f} ms/step)")
    except Exception as e:
        print(f"[attn] flash path failed: {type(e).__name__}: {e}")


if __name__ == "__main__":
    main()
