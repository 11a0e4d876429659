#!/usr/bin/env python
"""Chained (tunnel-honest) per-stage timing of the inference graph on TPU."""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import jax
import jax.numpy as jnp

jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

from nopesac_tpu.models.nopesac import PlaneTRNopeSAC

H, W, B = 480, 640, 8
model = PlaneTRNopeSAC(dtype=jnp.bfloat16)
rng = np.random.default_rng(0)
img0 = jnp.asarray(rng.normal(size=(B, H, W, 3)).astype(np.float32))
img1 = jnp.asarray(rng.normal(size=(B, H, W, 3)).astype(np.float32))

variables = jax.jit(
    lambda a, b: model.init(
        {"params": jax.random.PRNGKey(0), "dropout": jax.random.PRNGKey(1)},
        a, b, method=model.inference, out_h=H, out_w=W))(img0[:1], img1[:1])
print("init done", flush=True)


def timed_chain(name, fn, iters=20):
    """fn(v, i0, feedback_scalar) -> f32 scalar; chained + final fetch."""
    f = jax.jit(fn)
    fb = jnp.asarray(0.0, jnp.float32)
    fb = f(variables, img0, fb)
    _ = float(fb)  # warmup + compile
    trivial = jax.jit(lambda x: x + 1.0)
    _ = float(trivial(fb))
    t0 = time.perf_counter()
    for _i in range(3):
        _ = float(trivial(fb))
    rtt = (time.perf_counter() - t0) / 3
    t0 = time.perf_counter()
    for i in range(iters):
        fb = f(variables, img0, fb)
    assert np.isfinite(float(fb))
    dt = (time.perf_counter() - t0 - rtt) / iters
    print(f"{name}: {dt*1e3:.2f} ms", flush=True)
    return dt


def backbone_only(v, i0, fb):
    feats, out, qf = model.apply(v, i0 + fb, method=model.detect)
    return sum(x.sum().astype(jnp.float32) for x in feats.values()) * 1e-20


def detect2_only(v, i0, fb):
    cat = jnp.concatenate([i0 + fb, i0 * 0.9], axis=0)
    feats, out, qf = model.apply(v, cat, method=model.detect)
    return (qf.sum().astype(jnp.float32)
            + sum(x.sum().astype(jnp.float32) for x in out.values()
                  if isinstance(x, jnp.ndarray))) * 1e-20


def detect_select(v, i0, fb):
    cat = jnp.concatenate([i0 + fb, i0 * 0.9], axis=0)
    feats, out, qf = model.apply(v, cat, method=model.detect)
    sel = model.apply(v, out, H, W, method=model.select_planes)
    return sum(x.sum().astype(jnp.float32) for x in sel.values()) * 1e-20


def full(v, i0, fb):
    out = model.apply(v, i0 + fb, i0 * 0.9, method=model.inference,
                      out_h=H, out_w=W)
    cam = out["cameras"]["camera"]
    parts = [cam["tran"].sum(), cam["rot"].sum(),
             out["view0"]["seg_gated"].astype(jnp.float32).sum(),
             out["view1"]["seg_gated"].astype(jnp.float32).sum(),
             out["assignment"].sum()]
    return sum(p.astype(jnp.float32) for p in parts) * 1e-20


t_full = timed_chain("full inference", full)
t_bb = timed_chain("detect 1 view (backbone+planeTR)", backbone_only)
t_d2 = timed_chain("detect 2 views (2B batch)", detect2_only)
t_sel = timed_chain("detect 2 views + select_planes", detect_select)
print(f"=> select_planes: {(t_sel-t_d2)*1e3:.2f} ms; "
      f"matching+camera: {(t_full-t_sel)*1e3:.2f} ms", flush=True)

# batch scaling of the full graph
for bs in (16, 32):
    i0 = jnp.asarray(np.random.default_rng(1).normal(size=(bs, H, W, 3)).astype(np.float32))

    def full_bs(v, unused, fb, i0=i0):
        out = model.apply(v, i0 + fb, i0 * 0.9, method=model.inference,
                          out_h=H, out_w=W)
        cam = out["cameras"]["camera"]
        parts = [cam["tran"].sum(), cam["rot"].sum(),
                 out["view0"]["seg_gated"].astype(jnp.float32).sum(),
                 out["view1"]["seg_gated"].astype(jnp.float32).sum(),
                 out["assignment"].sum()]
        return sum(p.astype(jnp.float32) for p in parts) * 1e-20

    t = timed_chain(f"full bs={bs}", full_bs, iters=10)
    print(f"   -> {bs/t:.0f} pairs/s", flush=True)
