#!/usr/bin/env python
"""Probe: serial blocked per-call latency with unique on-device inputs."""
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

h, w, batch = 480, 640, 8
model = PlaneTRNopeSAC(dtype=jnp.bfloat16)
rng = np.random.default_rng(0)
img0 = jnp.asarray(rng.normal(size=(1, h, w, 3)).astype(np.float32))
img1 = jnp.asarray(rng.normal(size=(1, h, w, 3)).astype(np.float32))

t0 = time.time()
variables = jax.jit(
    lambda a, b: model.init(
        {"params": jax.random.PRNGKey(0), "dropout": jax.random.PRNGKey(1)},
        a, b, method=model.inference, out_h=h, out_w=w))(img0, img1)
jax.block_until_ready(variables)
print(f"init {time.time()-t0:.1f}s", flush=True)


@jax.jit
def gen(key):
    k1, k2 = jax.random.split(key)
    return (jax.random.normal(k1, (batch, h, w, 3), jnp.float32),
            jax.random.normal(k2, (batch, h, w, 3), jnp.float32))


@jax.jit
def infer(v, i0, i1):
    out = model.apply(v, i0, i1, method=model.inference, out_h=h, out_w=w)
    cam = out["cameras"]["camera"]
    return {"tran": cam["tran"], "rot": cam["rot"],
            "seg0": out["view0"]["seg_gated"],
            "seg1": out["view1"]["seg_gated"],
            "valid0": out["view0"]["valid"], "assignment": out["assignment"]}


key = jax.random.PRNGKey(0)
a, b = gen(key)
jax.block_until_ready((a, b))
res = infer(variables, a, b)
jax.block_until_ready(res)
print("warmup done", flush=True)

# serial: block every call, unique inputs
lat = []
for i in range(8):
    key, sub = jax.random.split(key)
    a, b = gen(sub)
    jax.block_until_ready((a, b))
    t0 = time.perf_counter()
    res = infer(variables, a, b)
    jax.block_until_ready(res)
    lat.append(time.perf_counter() - t0)
print("serial per-call ms:", [f"{x*1e3:.1f}" for x in lat], flush=True)

# serial with SAME inputs (cache detector)
lat2 = []
for i in range(8):
    t0 = time.perf_counter()
    res = infer(variables, a, b)
    jax.block_until_ready(res)
    lat2.append(time.perf_counter() - t0)
print("serial SAME-input ms:", [f"{x*1e3:.1f}" for x in lat2], flush=True)

# pipelined with unique inputs (gen on device, chained)
n = 16
keys = [jax.random.split(jax.random.PRNGKey(100 + i))[0] for i in range(n)]
t0 = time.perf_counter()
outs = None
for i in range(n):
    a, b = gen(keys[i])
    outs = infer(variables, a, b)
jax.block_until_ready(outs)
dt = time.perf_counter() - t0
print(f"pipelined unique: {n*batch/dt:.1f} pairs/s ({dt/n*1e3:.1f} ms/call incl gen)",
      flush=True)

# device_get forcing: if block_until_ready returns early through the tunnel,
# fetching values reveals the true latency
lat3 = []
for i in range(6):
    key, sub = jax.random.split(key)
    a, b = gen(sub)
    _ = np.asarray(a[0, 0, 0])  # force inputs resident
    t0 = time.perf_counter()
    res = infer(variables, a, b)
    tran = np.asarray(res["tran"])  # host fetch of a small output
    lat3.append(time.perf_counter() - t0)
print("serial+device_get(tran) ms:", [f"{x*1e3:.1f}" for x in lat3], flush=True)

lat4 = []
for i in range(3):
    key, sub = jax.random.split(key)
    a, b = gen(sub)
    _ = np.asarray(a[0, 0, 0])
    t0 = time.perf_counter()
    res = infer(variables, a, b)
    m = np.asarray(res["seg0"])  # fetch the seg map (the largest host output)
    _ = np.asarray(res["gate0"])
    lat4.append(time.perf_counter() - t0)
print("serial+device_get(seg+gate) ms:", [f"{x*1e3:.1f}" for x in lat4], flush=True)

# bare backbone timing for a FLOP sanity anchor
@jax.jit
def backbone_only(v, i0):
    feats = model.apply(v, i0, method=lambda m, x: m.backbone(x))
    return feats["res5"].sum()

try:
    r = backbone_only(variables, a)
except Exception as e:
    print("backbone_only failed:", e)
    r = None
if r is not None:
    jax.block_until_ready(r)
    t0 = time.perf_counter()
    for i in range(10):
        r = backbone_only(variables, a)
    jax.block_until_ready(r)
    print(f"backbone fwd (bs=8, blocked-last): {(time.perf_counter()-t0)/10*1e3:.2f} ms",
          flush=True)
    t0 = time.perf_counter()
    rr = float(np.asarray(r))
    print(f"value fetch after block: {(time.perf_counter()-t0)*1e3:.2f} ms", flush=True)
