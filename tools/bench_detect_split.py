#!/usr/bin/env python
"""Split detect cost: backbone vs planeTR head (16-view batch)."""
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
img = jnp.asarray(rng.normal(size=(2 * B, H, W, 3)).astype(np.float32))

variables = jax.jit(
    lambda a, b: model.init(
        {"params": jax.random.PRNGKey(0), "dropout": jax.random.PRNGKey(1)},
        a, b, method=model.inference, out_h=H, out_w=W))(img[:1], img[:1])
print("init done", flush=True)


def timed_chain(name, fn, iters=15):
    f = jax.jit(fn)
    fb = jnp.asarray(0.0, jnp.float32)
    fb = f(variables, fb)
    _ = float(fb)
    trivial = jax.jit(lambda x: x + 1.0)
    _ = float(trivial(fb))
    t0 = time.perf_counter()
    for _i in range(3):
        _ = float(trivial(fb))
    rtt = (time.perf_counter() - t0) / 3
    t0 = time.perf_counter()
    for i in range(iters):
        fb = f(variables, fb)
    assert np.isfinite(float(fb))
    dt = (time.perf_counter() - t0 - rtt) / iters
    print(f"{name}: {dt*1e3:.2f} ms", flush=True)
    return dt


def backbone_only(v, fb):
    feats = model.apply(v, img + fb, method=lambda m, x: m.backbone(x))
    return sum(x.sum().astype(jnp.float32) for x in feats.values()) * 1e-20


def detect_full(v, fb):
    feats, out, qf = model.apply(v, img + fb, method=model.detect)
    s = qf.sum().astype(jnp.float32)
    for k, x in out.items():
        if isinstance(x, jnp.ndarray):
            s = s + x.sum().astype(jnp.float32)
    return s * 1e-20


t_bb = timed_chain("backbone only (16 views)", backbone_only)
t_det = timed_chain("backbone+planeTR (16 views)", detect_full)
print(f"=> planeTR head: {(t_det-t_bb)*1e3:.2f} ms", flush=True)
