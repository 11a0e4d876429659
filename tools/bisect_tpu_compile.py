#!/usr/bin/env python
"""Diagnostic: compile-time bisect of the inference graph on the TPU."""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

import jax
import jax.numpy as jnp

jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)


def stamp(msg, t0):
    print(f"[{msg}] {time.time() - t0:.1f}s", flush=True)
    return time.time()


def main(stage: str, batch: int = 8):
    B = batch
    t0 = time.time()
    masks = jnp.ones((B, 50), bool)
    pp = jnp.asarray(np.random.randn(B, 50, 3).astype(np.float32))

    if stage in ("sinkhorn", "all"):
        from nopesac_tpu.ops.sinkhorn_pallas import log_optimal_transport_masked_pallas

        s = jnp.asarray(np.random.randn(B, 50, 50).astype(np.float32))
        f = jax.jit(lambda x: log_optimal_transport_masked_pallas(
            x, jnp.float32(1.0), 200, masks, masks))
        out = f(s)
        jax.block_until_ready(out)
        t0 = stamp("pallas sinkhorn", t0)

    if stage in ("matching", "all"):
        from nopesac_tpu.models.matching_head import MatchingHead

        m = MatchingHead()
        qf = jnp.asarray(np.random.randn(B, 50, 256).astype(np.float32))
        cam = jnp.asarray(np.random.randn(B, 7).astype(np.float32))
        v = jax.jit(lambda: m.init(jax.random.PRNGKey(0), qf, qf, cam, pp, pp,
                                   masks, masks))()
        jax.block_until_ready(v)
        t0 = stamp("matching init", t0)
        fm = jax.jit(lambda vv: m.apply(vv, qf, qf, cam, pp, pp, masks, masks))
        out = fm(v)
        jax.block_until_ready(out)
        t0 = stamp("matching apply", t0)

    if stage in ("camera", "all"):
        from nopesac_tpu.models.camera_head import (
            PlaneCameraHead, build_geo_sequence, compute_sig_seq, warp_geo_sequence,
        )

        ch = PlaneCameraHead()
        feats = {k: jnp.asarray(np.random.randn(B, hh, ww, c).astype(np.float32))
                 for k, hh, ww, c in [("res2", 120, 160, 256), ("res3", 60, 80, 512),
                                      ("res4", 30, 40, 1024), ("res5", 15, 20, 2048)]}

        def full(mod):
            init = mod.pixel_camera(feats, feats, False)
            assignment = jnp.tile(jnp.eye(50)[None], (B, 1, 1))
            geo, valid, num = build_geo_sequence(pp, pp, assignment, 50)
            gg = warp_geo_sequence(geo, init["tran"], init["rot"])
            sig = compute_sig_seq(geo, init["tran"], init["rot"])
            return mod.refine(init["tran_feat"], init["rot_feat"], init["tran"],
                              init["rot"], geo, valid, sig, gg, False)

        v = jax.jit(lambda: ch.init({"params": jax.random.PRNGKey(0)}, method=full))()
        jax.block_until_ready(v)
        t0 = stamp("camera init(full)", t0)
        fc = jax.jit(lambda vv: ch.apply(vv, method=full))
        out = fc(v)
        jax.block_until_ready(out)
        t0 = stamp("camera apply(full)", t0)

    if stage in ("select", "all"):
        from nopesac_tpu.models.nopesac import PlaneTRNopeSAC

        mdl = PlaneTRNopeSAC()
        outputs = {
            "pred_logits": jnp.asarray(np.random.randn(B, 50, 2).astype(np.float32)),
            "pred_params": pp,
            "pred_mask_logits": jnp.asarray(
                np.random.randn(B, 50, 120, 160).astype(np.float32)),
        }
        fs = jax.jit(lambda o: mdl.apply({"params": {}}, o, 480, 640,
                                         method=mdl.select_planes))
        out = fs(outputs)
        jax.block_until_ready(out)
        t0 = stamp("select_planes bs8", t0)


if __name__ == "__main__":
    main(sys.argv[1] if len(sys.argv) > 1 else "all",
         int(sys.argv[2]) if len(sys.argv) > 2 else 8)
