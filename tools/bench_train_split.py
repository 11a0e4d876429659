#!/usr/bin/env python
"""Chained (tunnel-honest) decomposition of the production train step.

Times, on the real chip, each nested sub-graph of the bs=16 train step so
the 339 ms/step (BENCH_r04) can be attributed: backbone fwd+bwd alone,
detection loss fwd, detection loss fwd+bwd, full loss zoo fwd+bwd, and the
full step with optimizer. Every section runs as its own jitted chain with a
feedback scalar (the axon tunnel caches identical (program, args) pairs and
returns from block_until_ready early; chaining + a final host fetch defeats
both — see bench.py "Measurement honesty").

Usage: python tools/bench_train_split.py [--batch 16] [--iters 8]
"""
import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import jax
import jax.numpy as jnp

jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=16)
    ap.add_argument("--iters", type=int, default=8)
    ap.add_argument("--sections", default="",
                    help="comma list to restrict (names printed as they run)")
    ap.add_argument("--bb-train-dtype", default="float32",
                    choices=("float32", "bfloat16"),
                    help="MODEL.BACKBONE_TRAIN_DTYPE for the run (mixed "
                         "f32-trunk/bf16-interior backbone when bfloat16)")
    args = ap.parse_args()

    from nopesac_tpu.config.config import get_cfg
    from nopesac_tpu.data.mapper import PairMapper, collate
    from nopesac_tpu.data.synthetic import make_dataset
    from nopesac_tpu.engine.trainer import build_model_from_cfg

    B, H, W = args.batch, 480, 640
    cfg = get_cfg()
    cfg.MODEL.EMBEDDING_ON = True
    cfg.MODEL.CAMERA_ON = True
    cfg.MODEL.LOSS_CAMERA_ON = True
    cfg.MODEL.LOSS_EMB_ON = True
    cfg.MODEL.CAMERA_HEAD.NAME = "PlaneCameraHead"
    cfg.MODEL.CAMERA_HEAD.REFINE_ON = True
    cfg.MODEL.CAMERA_HEAD.CAM_REC_ON = True
    cfg.MODEL.CAMERA_HEAD.RAND_ON = True
    cfg.MODEL.SEM_SEG_HEAD.PARAM_ON = True
    cfg.MODEL.SEM_SEG_HEAD.CENTER_ON = True
    cfg.MODEL.COMPUTE_DTYPE = "bfloat16"
    cfg.MODEL.BACKBONE_TRAIN_DTYPE = args.bb_train_dtype
    model = build_model_from_cfg(cfg)

    data = make_dataset(n_pairs=B, n_planes=6, h=H, w=W)
    mapper = PairMapper(is_train=True, dataset_kind="mp3d", image_size=(H, W))
    batch = collate([mapper(d) for d in data])
    batch.pop("meta")
    batch = jax.tree_util.tree_map(jnp.asarray, batch)

    t0 = time.time()
    variables = jax.jit(lambda b: model.init(
        {"params": jax.random.PRNGKey(0), "dropout": jax.random.PRNGKey(1)},
        b, jax.random.PRNGKey(2), method=model.train_forward))(batch)
    jax.block_until_ready(variables)
    print(f"init done ({time.time()-t0:.0f}s)", flush=True)

    only = [s for s in args.sections.split(",") if s]

    def timed_chain(name, fn, *extra, iters=args.iters):
        """fn(variables, batch, feedback) -> f32 scalar."""
        if only and name not in only:
            return
        f = jax.jit(fn)
        fb = jnp.asarray(0.0, jnp.float32)
        tc = time.time()
        fb = f(variables, batch, fb)
        _ = float(fb)
        compile_s = time.time() - tc
        trivial = jax.jit(lambda x: x + 1.0)
        _ = float(trivial(fb))
        t0 = time.perf_counter()
        for _ in range(3):
            _ = float(trivial(fb))
        rtt = (time.perf_counter() - t0) / 3
        t0 = time.perf_counter()
        for _ in range(iters):
            fb = f(variables, batch, fb)
        assert np.isfinite(float(fb))
        dt = (time.perf_counter() - t0 - rtt) / iters
        print(f"{name:34s} {dt*1e3:9.2f} ms  (compile {compile_s:.0f}s)",
              flush=True)

    # Standalone backbone twin (same flax config as PlaneTRNopeSAC.setup's
    # `self.backbone = ResNet(dtype=self.dtype, remat=self.remat_backbone)`)
    # applied to the model's own "backbone" params subtree.
    from nopesac_tpu.models.resnet import ResNet
    bb = ResNet(dtype=model.dtype, remat=True,
                train_block_dtype=model.backbone_train_dtype)

    def bb_params(v):
        return {"params": v["params"]["backbone"]}

    def backbone_fwd(v, bt, fb):
        img = jnp.concatenate([bt["image0"], bt["image1"]], axis=0)
        img = img + fb
        feats = bb.apply(bb_params(v), img, True)
        return sum(jnp.sum(f.astype(jnp.float32)) for f in feats.values()) * 1e-20

    def backbone_fwdbwd(v, bt, fb):
        img = jnp.concatenate([bt["image0"], bt["image1"]], axis=0)
        img = img + fb

        def loss(p):
            feats = bb.apply({"params": p}, img, True)
            return sum(jnp.sum(jnp.square(f.astype(jnp.float32)))
                       for f in feats.values())

        l, g = jax.value_and_grad(loss)(v["params"]["backbone"])
        gn = sum(jnp.sum(jnp.abs(x.astype(jnp.float32)))
                 for x in jax.tree_util.tree_leaves(g))
        return (l + gn) * 1e-20

    def backbone_infer(v, bt, fb):
        # eval-mode bf16 backbone for comparison (no remat, bf16 storage)
        img = jnp.concatenate([bt["image0"], bt["image1"]], axis=0)
        img = img + fb
        feats = bb.apply(bb_params(v), img, False)
        return sum(jnp.sum(f.astype(jnp.float32)) for f in feats.values()) * 1e-20

    # --- full train_forward loss (fwd only / fwd+bwd) ---------------------
    def loss_total(v, bt, params=None):
        p = v["params"] if params is None else params
        losses, _ = model.apply(
            {"params": p, "batch_stats": v.get("batch_stats", {})},
            bt, jax.random.PRNGKey(7), method=model.train_forward,
            mutable=["batch_stats"], rngs={"dropout": jax.random.PRNGKey(8)})
        return sum(x.astype(jnp.float32) for x in losses.values())

    def full_fwd(v, bt, fb):
        bt = dict(bt, image0=bt["image0"] + fb)
        return loss_total(v, bt) * 1e-20

    def full_fwdbwd(v, bt, fb):
        bt = dict(bt, image0=bt["image0"] + fb)
        l, g = jax.value_and_grad(lambda p: loss_total(v, bt, p))(v["params"])
        gn = sum(jnp.sum(jnp.abs(x.astype(jnp.float32)))
                 for x in jax.tree_util.tree_leaves(g))
        return (l + gn) * 1e-20

    # --- loss-subset fwd+bwd: summing only a subset of the loss dict lets
    # XLA dead-code-eliminate the other branches' fwd AND bwd, attributing
    # step time per loss family while keeping ONE model/trace ------------
    def subset_total(v, bt, pred):
        losses, _ = model.apply(
            {"params": v["params"], "batch_stats": v.get("batch_stats", {})},
            bt, jax.random.PRNGKey(7), method=model.train_forward,
            mutable=["batch_stats"], rngs={"dropout": jax.random.PRNGKey(8)})
        return sum(x.astype(jnp.float32) for k, x in losses.items() if pred(k))

    def make_subset_fwdbwd(pred):
        def fn(v, bt, fb):
            bt = dict(bt, image0=bt["image0"] + fb)
            l, g = jax.value_and_grad(
                lambda p: subset_total({**v, "params": p}, bt, pred))(v["params"])
            gn = sum(jnp.sum(jnp.abs(x.astype(jnp.float32)))
                     for x in jax.tree_util.tree_leaves(g))
            return (l + gn) * 1e-20
        return fn

    DET = ("loss_ce", "loss_mask", "loss_dice", "loss_center", "loss_param",
           "loss_q", "loss_depth")
    det_pred = lambda k: k.startswith(DET)
    emb_pred = lambda k: k.startswith("losses_emb")
    cam_pred = lambda k: not det_pred(k) and not emb_pred(k)

    # --- detect fwd + JV matcher isolation -------------------------------
    from nopesac_tpu.losses import criterion as CR
    from nopesac_tpu.data.packing import unpack_targets

    def detect_fwd(v, bt, fb):
        img = jnp.concatenate([bt["image0"], bt["image1"]], axis=0) + fb
        _, out, qf = model.apply(
            {"params": v["params"], "batch_stats": v.get("batch_stats", {})},
            img, True, method=model.detect,
            mutable=["batch_stats"], rngs={"dropout": jax.random.PRNGKey(8)},
        )[0]
        return (sum(jnp.sum(x.astype(jnp.float32))
                    for x in jax.tree_util.tree_leaves(out))
                + jnp.sum(qf.astype(jnp.float32))) * 1e-20

    def detect_plus_jv(v, bt, fb):
        img = jnp.concatenate([bt["image0"], bt["image1"]], axis=0) + fb
        t0s = unpack_targets(bt["targets0"])
        t1s = unpack_targets(bt["targets1"])
        targets_cat = jax.tree_util.tree_map(
            lambda a, c: jnp.concatenate([a, c], axis=0), t0s, t1s)
        _, out, qf = model.apply(
            {"params": v["params"], "batch_stats": v.get("batch_stats", {})},
            img, True, method=model.detect,
            mutable=["batch_stats"], rngs={"dropout": jax.random.PRNGKey(8)},
        )[0]
        mw = {"cost_class": 1.0, "cost_mask": 20.0, "cost_dice": 1.0,
              "cost_center": 0.5, "cost_param": 0.25,
              "cost_param_offset": 0.01, "cost_param_normal_angle": 0.0028}
        matches = CR.match_planes_multi(
            [out] + list(out["aux_outputs"]), targets_cat, mw)
        return (sum(jnp.sum(m.astype(jnp.float32)) for m in matches)
                + jnp.sum(qf.astype(jnp.float32))) * 1e-20

    timed_chain("backbone fwd (train f32+remat)", backbone_fwd)
    timed_chain("backbone fwd (eval bf16)", backbone_infer)
    timed_chain("backbone fwd+bwd (train)", backbone_fwdbwd)
    timed_chain("full loss fwd", full_fwd)
    timed_chain("full loss fwd+bwd", full_fwdbwd)
    timed_chain("detect fwd (backbone+head)", detect_fwd)
    timed_chain("detect fwd + batched JV", detect_plus_jv)
    timed_chain("detection losses fwd+bwd", make_subset_fwdbwd(det_pred))
    timed_chain("matching loss fwd+bwd", make_subset_fwdbwd(emb_pred))
    timed_chain("camera losses fwd+bwd", make_subset_fwdbwd(cam_pred))

    # criterion attribution: each subset still carries backbone+plane-head
    # fwd+bwd (grads flow through them); differences vs "ce only" isolate
    # the per-loss-family criterion cost
    mask_pred = lambda k: k.startswith(("loss_mask", "loss_dice"))
    q_pred = lambda k: k.startswith("loss_q")
    ce_pred = lambda k: k.startswith("loss_ce")
    cparam_pred = lambda k: k.startswith(("loss_center", "loss_param"))

    def full_fwd_det(v, bt, fb):
        bt = dict(bt, image0=bt["image0"] + fb)
        return subset_total(v, bt, det_pred) * 1e-20

    timed_chain("detection losses fwd ONLY", full_fwd_det)
    timed_chain("ce loss fwd+bwd", make_subset_fwdbwd(ce_pred))
    timed_chain("mask+dice losses fwd+bwd", make_subset_fwdbwd(mask_pred))
    timed_chain("q loss fwd+bwd", make_subset_fwdbwd(q_pred))
    timed_chain("center+param losses fwd+bwd", make_subset_fwdbwd(cparam_pred))

    # plane-head isolation: detect-output-sum fwd+bwd with the default model
    # vs a dropout=0 twin (flax Dropout rate==0 short-circuits, so the delta
    # is the full RNG-generation + mask-multiply cost of train-mode dropout)
    def make_detect_fwdbwd(m, rng_impl="threefry2x32"):
        def fn(v, bt, fb):
            img = jnp.concatenate([bt["image0"], bt["image1"]], axis=0) + fb
            drop_rng = jax.random.key(8, impl=rng_impl)

            def loss(p):
                _, out, qf = m.apply(
                    {"params": p, "batch_stats": v.get("batch_stats", {})},
                    img, True, method=m.detect,
                    mutable=["batch_stats"],
                    rngs={"dropout": drop_rng},
                )[0]
                return (sum(jnp.sum(jnp.square(x.astype(jnp.float32)))
                            for x in jax.tree_util.tree_leaves(out))
                        + jnp.sum(qf.astype(jnp.float32)))

            l, g = jax.value_and_grad(loss)(v["params"])
            gn = sum(jnp.sum(jnp.abs(x.astype(jnp.float32)))
                     for x in jax.tree_util.tree_leaves(g))
            return (l + gn) * 1e-20
        return fn

    cfg_nd = cfg.clone()
    cfg_nd.MODEL.SEM_SEG_HEAD.DROPOUT = 0.0
    model_nodrop = build_model_from_cfg(cfg_nd)
    timed_chain("detect fwd+bwd", make_detect_fwdbwd(model))
    timed_chain("detect fwd+bwd (dropout=0)", make_detect_fwdbwd(model_nodrop))
    timed_chain("detect fwd+bwd (rbg dropout)", make_detect_fwdbwd(model, "rbg"))

    # standalone mask-loss kernel timing at the real training shapes
    # ([2B,NQ,120,160] logits vs [2B,NG,480,640] gt), isolated from the
    # rest of the step; use_pallas toggles kernel vs naive XLA chain
    from nopesac_tpu.losses.criterion import mask_focal_dice

    def make_maskloss(use_pallas, grad, with_matched=True):
        nq = model.num_queries
        b2 = 2 * B

        def fn(v, bt, fb):
            # everything derived from the batch ON DEVICE inside the jit -
            # closed-over [2B,NG,480,640] masks / [2B,NQ,120,160] logits
            # embed ~491MB constants in the HLO and the tunnel rejects the
            # upload with HTTP 413
            t0s = unpack_targets(bt["targets0"])
            t1s = unpack_targets(bt["targets1"])
            gt_masks = jnp.concatenate(
                [t0s["gt_masks"], t1s["gt_masks"]], axis=0)
            valid = jnp.concatenate(
                [t0s["gt_valid"], t1s["gt_valid"]], axis=0)
            qidx = jnp.arange(nq)[None]
            num_gt = jnp.sum(valid.astype(jnp.int32), axis=-1, keepdims=True)
            matched = qidx < num_gt  # first num_gt queries matched
            tgt_idx = jnp.where(matched, qidx, 0)
            n = b2 * nq * 120 * 160
            flat = bt["image0"].reshape(-1)
            reps = n // flat.size + 1
            src = jnp.tile(flat, reps)[:n].reshape(b2, nq, 120, 160) + fb

            def loss(s):
                fp, dc = mask_focal_dice(
                    s, gt_masks, tgt_idx, use_pallas=use_pallas,
                    matched=(matched if with_matched else None))
                m = matched.astype(jnp.float32)
                return jnp.sum(fp * m) + jnp.sum(dc * m)

            if grad:
                l, g = jax.value_and_grad(loss)(src)
                return (l + jnp.sum(jnp.abs(g))) * 1e-20
            return loss(src) * 1e-20
        return fn

    timed_chain("maskloss pallas fwd", make_maskloss(True, False))
    timed_chain("maskloss pallas fwd+bwd", make_maskloss(True, True))
    timed_chain("maskloss pallas fwd+bwd all-50", make_maskloss(True, True, False))
    timed_chain("maskloss naive fwd+bwd", make_maskloss(False, True))


if __name__ == "__main__":
    main()
