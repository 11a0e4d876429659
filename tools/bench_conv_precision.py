#!/usr/bin/env python
"""On-chip probe: what do f32 convs cost at each precision, per backbone stage?

The train-mode detection pathway keeps the backbone f32 (the residual
stream's query-distinguishing signal rounds away in bf16 — PERF.md), but
"f32 storage" and "f32 matmul passes" are separable on TPU: the MXU runs
bf16-operand/f32-accumulate natively, so f32 convs can execute as 1 pass
(Precision.DEFAULT — operands rounded to bf16), 3 passes (HIGH) or 6
passes (HIGHEST). Storage (residual stream / activations) stays f32 in
all of them. This probe measures, per backbone conv shape at bs=32
(2B siamese):

  f32_default   f32 in/out, Precision.DEFAULT (1-pass bf16 operands)
  f32_high      f32 in/out, Precision.HIGH    (3-pass)
  f32_highest   f32 in/out, Precision.HIGHEST (6-pass)
  bf16          all-bf16 storage + compute

fwd-only and fwd+bwd (grad wrt kernel+input). The measurement loop runs
INSIDE the compiled program (lax.scan chaining a scalar through each
iteration) so remote-tunnel dispatch latency is amortised: one dispatch
per timing, `--iters` conv executions inside it.

Usage: python tools/bench_conv_precision.py [--iters 30] [--shapes a,b]
"""
import argparse
import sys
import time

import jax
import jax.numpy as jnp
from jax import lax

jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

DIMNUMS = ("NHWC", "HWIO", "NHWC")

# (name, x_shape, k_shape, stride)  -- bs=32 train shapes
SHAPES = [
    ("stem7x7", (32, 480, 640, 3), (7, 7, 3, 64), 2),
    ("res2_3x3", (32, 120, 160, 64), (3, 3, 64, 64), 1),
    ("res2_1x1out", (32, 120, 160, 64), (1, 1, 64, 256), 1),
    ("res2_1x1in", (32, 120, 160, 256), (1, 1, 256, 64), 1),
    ("res3_3x3", (32, 60, 80, 128), (3, 3, 128, 128), 1),
    ("res4_3x3", (32, 30, 40, 256), (3, 3, 256, 256), 1),
    ("res5_3x3", (32, 15, 20, 512), (3, 3, 512, 512), 1),
    # MXU calibration: big square matmul (what "peak" looks like here)
    ("mm4096", (4096, 4096), (4096, 4096), 0),
]

PRECS = {
    "f32_default": lax.Precision.DEFAULT,
    "f32_high": lax.Precision.HIGH,
    "f32_highest": lax.Precision.HIGHEST,
    "bf16": lax.Precision.DEFAULT,
}


def one_op(variant, stride, kshape):
    """(x, k) -> scalar; the op under test reduced to a chainable scalar."""
    if len(kshape) == 2:  # matmul calibration case
        def f(x, k):
            if variant == "bf16":
                x, k = x.astype(jnp.bfloat16), k.astype(jnp.bfloat16)
            out = jnp.dot(x, k, precision=PRECS[variant])
            # square so the grad cotangent is non-constant (a constant
            # cotangent lets XLA collapse the transpose convs/matmuls)
            return jnp.sum(out.astype(jnp.float32) ** 2) * 1e-20
        return f
    pad = [(kshape[0] // 2,) * 2, (kshape[1] // 2,) * 2]

    def f(x, k):
        if variant == "bf16":
            x, k = x.astype(jnp.bfloat16), k.astype(jnp.bfloat16)
        out = lax.conv_general_dilated(
            x, k, (stride, stride), pad, dimension_numbers=DIMNUMS,
            precision=PRECS[variant])
        return jnp.sum(out.astype(jnp.float32) ** 2) * 1e-20
    return f


def scanned(fn, iters):
    """Compile a program that runs `fn(x,k)` iters times, serially chained."""
    def prog(x, k):
        def body(s, _):
            # fold the carry into x so iterations can't be CSE'd/elided
            r = fn(x * (1.0 + s * 1e-30).astype(x.dtype), k)
            return r.astype(jnp.float32), ()
        s, _ = lax.scan(body, jnp.float32(0.0), None, length=iters)
        return s
    return jax.jit(prog)


def timed(prog, x, k):
    t0 = time.time()
    r = float(prog(x, k))  # includes compile
    compile_and_run = time.time() - t0
    t0 = time.time()
    r = float(prog(x, k))
    run_s = time.time() - t0
    del r
    return run_s, compile_and_run


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--iters", type=int, default=30)
    ap.add_argument("--shapes", default="")
    ap.add_argument("--variants", default="f32_default,f32_high,f32_highest,bf16")
    args = ap.parse_args()
    only = [s for s in args.shapes.split(",") if s]
    variants = [v for v in args.variants.split(",") if v]

    key = jax.random.PRNGKey(0)
    print(f"devices: {jax.devices()}", flush=True)
    for name, xs, ks, stride in SHAPES:
        if only and name not in only:
            continue
        x = jax.random.normal(key, xs, jnp.float32)
        k = jax.random.normal(key, ks, jnp.float32) * 0.05
        if len(ks) == 2:
            flops = 2 * xs[0] * xs[1] * ks[1]
        else:
            oh, ow = xs[1] // stride, xs[2] // stride
            flops = 2 * xs[0] * oh * ow * ks[0] * ks[1] * ks[2] * ks[3]
        for variant in variants:
            fn = one_op(variant, stride, ks)
            fwd = scanned(fn, args.iters)

            def gfn(x_, k_):
                gx, gk = jax.grad(fn, argnums=(0, 1))(x_, k_)
                return (jnp.sum(gx.astype(jnp.float32)) * 1e-20
                        + jnp.sum(gk.astype(jnp.float32)) * 1e-20)
            bwd = scanned(gfn, args.iters)
            try:
                fwd_s, fwd_c = timed(fwd, x, k)
                bwd_s, bwd_c = timed(bwd, x, k)
            except Exception as e:  # noqa: BLE001
                print(f"{name:12s} {variant:12s} ERROR {type(e).__name__}: {e}",
                      flush=True)
                continue
            fwd_ms = fwd_s / args.iters * 1000.0
            bwd_ms = bwd_s / args.iters * 1000.0
            tf_fwd = flops / fwd_ms / 1e9
            tf_bwd = 3 * flops / bwd_ms / 1e9
            print(f"{name:12s} {variant:12s} fwd {fwd_ms:7.3f} ms ({tf_fwd:6.1f} TF/s)"
                  f"  fwd+bwd {bwd_ms:7.3f} ms ({tf_bwd:6.1f} TF/s)"
                  f"  [compile {fwd_c:.0f}s/{bwd_c:.0f}s]", flush=True)


if __name__ == "__main__":
    sys.exit(main())
