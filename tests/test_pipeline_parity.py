"""Pipeline-level numeric parity against the reference's OWN glue code.

Where test_reference_parity.py checks heads in isolation, this file executes
the reference's *meta-architecture glue* — the GT corr-matrix builder over
predicted plane indices, the `_postprocess_planeHeadMask` instance
assembly, the inference_Joint camera zoo, and the full train-mode loss dict
— side by side with nopesac_tpu's implementations on identical inputs (and,
where weights matter, identical imported weights).

Specs: siamese_planeTR.py:566-623 (corr matrix), :625-803 (postprocess),
camera_head.py:400-640 (inference_Joint), siamese_planeTR.py:208-299 (train
loss dict).
"""
from __future__ import annotations

import os
import pickle
from types import SimpleNamespace

import numpy as np
import pytest

torch = pytest.importorskip("torch")

pytestmark = pytest.mark.skipif(
    not os.path.isdir("/root/reference"), reason="reference checkout not mounted"
)

import refstubs  # noqa: F401

# the reference uses the removed numpy aliases (siamese_planeTR.py:727
# `np.float`); restore them so its code executes on modern numpy
if not hasattr(np, "float"):
    np.float = float  # type: ignore[attr-defined]
if not hasattr(np, "bool"):
    np.bool = bool  # type: ignore[attr-defined]

torch.Tensor.cuda = lambda self, *a, **k: self

import jax
import jax.numpy as jnp

from test_reference_parity import DIFFS, record, _t  # noqa: F401


def teardown_module(module):
    import json

    out = os.path.join(os.path.dirname(__file__), "..", ".parity_diffs.json")
    existing = {}
    if os.path.exists(out):
        with open(out) as f:
            existing = json.load(f)
    existing.update(DIFFS)
    with open(out, "w") as f:
        json.dump(existing, f, indent=1, sort_keys=True)


# --------------------------------------------------- inference_Joint (full)
class TestInferenceJointExecuted:
    """The reference's inference_Joint (camera_head.py:400-640) — initial
    pose, sign canonicalisation, AIM reconstruction, matching with the rec
    pose as geometric prior, mutual-max assignment, pred geo sequence,
    refine + soft fusion, and the 45-degree/1-m assignment re-gating — vs
    our camera_inference glue, with identical injected backbone features,
    detected planes, and imported weights on both sides."""

    @pytest.fixture(scope="class")
    def both(self, tmp_path_factory):
        from detectron2.layers import ShapeSpec

        from NopeSAC_Net.modeling.camera_net.camera_head import PlaneCameraHead as RefCH
        from NopeSAC_Net.modeling.matching_net.matching_head import MatchingHead as RefMH

        from nopesac_tpu.config.config import get_cfg
        from nopesac_tpu.engine.trainer import build_model_from_cfg
        from nopesac_tpu.utils.torch_import import import_torch_weights
        from test_reference_parity import _save_ref_ckpt_with_perturbed_bn

        tmp_path = tmp_path_factory.mktemp("joint")
        cfg = get_cfg()
        cfg.MODEL.MASK_ON = True
        cfg.MODEL.EMBEDDING_ON = True
        cfg.MODEL.CAMERA_ON = True
        cfg.MODEL.CAMERA_HEAD.CAM_REC_ON = True
        cfg.MODEL.CAMERA_HEAD.REFINE_ON = True
        input_shape = {
            f"res{i}": ShapeSpec(channels=c, stride=s)
            for i, c, s in ((2, 256, 4), (3, 512, 8), (4, 1024, 16), (5, 2048, 32))
        }
        torch.manual_seed(17)
        ref_ch = RefCH(cfg, input_shape)
        ref_mh = RefMH(cfg)
        state = {f"camera_head_list.0.{k}": v for k, v in ref_ch.state_dict().items()}
        state.update({f"matching_head.{k}": v for k, v in ref_mh.state_dict().items()})
        ckpt = tmp_path / "joint.pth"
        # perturb the camera head's BN running stats so the stats import is
        # load-bearing, then refresh its entries in the combined state dict
        _save_ref_ckpt_with_perturbed_bn(ref_ch, "camera_head_list.0", ckpt)
        state.update({f"camera_head_list.0.{k}": v
                      for k, v in ref_ch.state_dict().items()})
        torch.save({"model": state}, str(ckpt))
        ref_ch = ref_ch.eval()
        ref_mh = ref_mh.eval()

        # ---- shared random inputs (bs=1: the reference's inference sign
        # flips index batch row 0 only, siamese_planeTR.py:340 enforces bs=1)
        rng = np.random.default_rng(23)
        dims = {"res2": (256, 120, 160), "res3": (512, 60, 80),
                "res4": (1024, 30, 40), "res5": (2048, 15, 20)}
        f1 = {k: (rng.normal(size=(1, c, h, w)) * 0.3).astype(np.float32)
              for k, (c, h, w) in dims.items()}
        f2 = {k: (rng.normal(size=(1, c, h, w)) * 0.3).astype(np.float32)
              for k, (c, h, w) in dims.items()}
        n1, n2, nq, c = 7, 6, 50, 256
        app1 = rng.normal(size=(1, n1, c)).astype(np.float32)
        app2 = rng.normal(size=(1, n2, c)).astype(np.float32)
        pl1 = (rng.normal(size=(1, n1, 3)) * 1.5).astype(np.float32)
        pl2 = (rng.normal(size=(1, n2, 3)) * 1.5).astype(np.float32)

        with torch.no_grad():
            ref_out = ref_ch(
                {k: _t(v) for k, v in f1.items()},
                {k: _t(v) for k, v in f2.items()},
                _t(pl1), _t(pl2), planeApp1=_t(app1), planeApp2=_t(app2),
                gt_pose=None, batched_inputs=[{}], matching_net=ref_mh)
        ref_cams, _, _, ref_logscores, ref_ass, ref_pose = ref_out

        # ---- ours: same inputs through the real camera_inference glue
        cfg2 = cfg.clone()
        model = build_model_from_cfg(cfg2)
        feats_cat = {k: jnp.asarray(np.transpose(
            np.concatenate([f1[k], f2[k]], 0), (0, 2, 3, 1))) for k in dims}
        qf0 = np.zeros((1, nq, c), np.float32)
        qf1 = np.zeros((1, nq, c), np.float32)
        qf0[:, :n1] = app1
        qf1[:, :n2] = app2
        params0 = np.zeros((1, nq, 3), np.float32)
        params1 = np.zeros((1, nq, 3), np.float32)
        params0[:, :n1] = pl1
        params1[:, :n2] = pl2
        valid0 = np.zeros((1, nq), bool)
        valid1 = np.zeros((1, nq), bool)
        valid0[:, :n1] = True
        valid1[:, :n2] = True
        args = (feats_cat, jnp.asarray(qf0), jnp.asarray(qf1),
                jnp.asarray(params0), jnp.asarray(params1),
                jnp.asarray(valid0), jnp.asarray(valid1))
        from nopesac_tpu.models.nopesac import PlaneTRNopeSAC

        variables = model.init(jax.random.PRNGKey(0), *args,
                               method=PlaneTRNopeSAC.camera_inference)
        params, bstats = import_torch_weights(
            variables["params"], str(ckpt),
            batch_stats=variables.get("batch_stats", {}))
        out = model.apply({"params": params, "batch_stats": bstats}, *args,
                          method=PlaneTRNopeSAC.camera_inference)
        return ref_cams, ref_logscores, ref_ass, ref_pose, out, (n1, n2)

    def test_camera_zoo(self, both):
        ref_cams, _, _, _, out, _ = both
        cams = out["cameras"]
        for key, tol in (("camera_zero", 0.0), ("camera_init", 2e-4),
                         ("camera_initRec", 5e-4), ("camera_avgRef0", 2e-3),
                         ("camera_softRef0", 2e-3), ("camera", 2e-3)):
            assert key in cams, f"ours missing {key}"
            assert key in ref_cams, f"reference missing {key}"
            record(f"pipeline: inference_Joint {key} tran "
                   "(camera_head.py:400-640)",
                   np.asarray(cams[key]["tran"]),
                   ref_cams[key]["tran"].numpy(), max(tol, 1e-12))
            record(f"pipeline: inference_Joint {key} rot "
                   "(camera_head.py:400-640)",
                   np.asarray(cams[key]["rot"]),
                   ref_cams[key]["rot"].numpy(), max(tol, 1e-12))

    def test_log_scores_and_assignment(self, both):
        _, ref_logscores, ref_ass, _, out, (n1, n2) = both
        ls = np.asarray(out["log_scores"])  # [1, NQ+1, NQ+1]
        sel = np.ix_([0], list(range(n1)) + [50], list(range(n2)) + [50])
        record("pipeline: inference_Joint matching log-scores "
               "(camera_head.py:493-498)",
               ls[sel], ref_logscores[0].numpy(), 1e-3)
        before = np.asarray(out["assignment_beforeRef"])[0, :n1, :n2]
        record("pipeline: assignment before refinement (camera_head.py:501)",
               before, ref_ass["pred_assignment_beforeRef0"].numpy()[0], 0.0)
        after = np.asarray(out["assignment"])[0, :n1, :n2]
        record("pipeline: assignment after 45deg/1m re-gating "
               "(camera_head.py:605-629)",
               after, ref_ass["pred_assignment"].numpy()[0], 0.0)
        assert before.sum() >= 3, "degenerate fixture: too few matches"

    def test_one_plane_hypotheses(self, both):
        _, _, _, ref_pose, out, _ = both
        hv = np.asarray(out["camera_onePP"]["hyp_valid"][0])
        m1 = int(hv.sum())
        record("pipeline: one-plane hypothesis poses (camera_head.py:635-639)",
               np.asarray(out["camera_onePP"]["tran"][0])[:m1],
               ref_pose["all_pred_trans"].numpy()[0], 2e-3)
        record("pipeline: one-plane hypothesis rots (camera_head.py:635-639)",
               np.asarray(out["camera_onePP"]["rot"][0])[:m1],
               ref_pose["all_pred_rots"].numpy()[0], 2e-3)


# ------------------------------------------------------ GT corr matrix glue
class TestCorrMatrixBuilder:
    """process_plane_corr_matrix (siamese_planeTR.py:566-623) vs
    losses/matching.py build_pred_corr_matrix, executed on the same random
    Hungarian assignments + gt_corrs (including out-of-range entries that the
    50-cap must drop)."""

    def test_corr_matrix(self):
        from NopeSAC_Net.modeling.meta_arch.siamese_planeTR import PlaneTR_NopeSAC

        from nopesac_tpu.losses.matching import build_pred_corr_matrix

        rng = np.random.default_rng(21)
        bs, nq = 3, 50
        fake = SimpleNamespace(device=torch.device("cpu"), num_queries=nq)

        batched_inputs = []
        idx1, idx2 = [], []
        match1 = np.full((bs, nq), -1, np.int64)
        match2 = np.full((bs, nq), -1, np.int64)
        corr_idx1 = np.zeros((bs, nq), np.int32)
        corr_idx2 = np.zeros((bs, nq), np.int32)
        corr_valid = np.zeros((bs, nq), bool)
        for b in range(bs):
            n_gt = int(rng.integers(3, 12))
            # Hungarian output: (pred_idx, gt_idx) with gt indices 0..n_gt-1
            src1 = rng.choice(nq, size=n_gt, replace=False)
            src2 = rng.choice(nq, size=n_gt, replace=False)
            tgt = rng.permutation(n_gt)
            idx1.append((torch.as_tensor(src1), torch.as_tensor(tgt)))
            idx2.append((torch.as_tensor(src2), torch.as_tensor(tgt.copy())))
            match1[b, src1] = tgt
            match2[b, src2] = tgt
            # gt corrs over gt indices; sprinkle out-of-cap entries (>=50)
            n_corr = int(rng.integers(1, n_gt + 1))
            pairs = [[int(rng.integers(0, n_gt)), int(rng.integers(0, n_gt))]
                     for _ in range(n_corr)]
            pairs.insert(0, [55, 2])  # dropped by the <50 cap on view 0
            pairs.append([1, 61])  # dropped on view 1
            batched_inputs.append({"gt_corrs": pairs})
            kept = [(a, c) for a, c in pairs if a < nq and c < nq]
            for k, (a, c) in enumerate(kept):
                corr_idx1[b, k] = a
                corr_idx2[b, k] = c
                corr_valid[b, k] = True

        ref = PlaneTR_NopeSAC.process_plane_corr_matrix(
            fake, batched_inputs, idx1, idx2)

        ours = build_pred_corr_matrix(
            jnp.asarray(match1, jnp.int32), jnp.asarray(match2, jnp.int32),
            jnp.asarray(corr_idx1), jnp.asarray(corr_idx2),
            jnp.asarray(corr_valid), nq)

        record("pipeline: GT corr matrix over pred indices "
               "(siamese_planeTR.py:566-623)",
               np.asarray(ours, np.float64), ref.numpy().astype(np.float64), 0.0)


# ----------------------------------------------------- postprocess executed
def _ref_postprocess(planeTR_outputs_np, batched_inputs, nq,
                     plane_score_threshold=0.6, mask_prob_threshold=0.5,
                     overlap_threshold=0.6):
    """Execute the reference's _postprocess_planeHeadMask on plain dicts."""
    from NopeSAC_Net.modeling.meta_arch.siamese_planeTR import PlaneTR_NopeSAC

    h, w = 480, 640
    xy = np.zeros((2, h, w), np.float32)
    xy[0] = (np.arange(w, dtype=np.float32) / w)[None, :]
    xy[1] = (np.arange(h, dtype=np.float32) / h)[:, None]
    fake = SimpleNamespace(
        num_queries=nq,
        plane_score_threshold=plane_score_threshold,
        mask_prob_threshold=mask_prob_threshold,
        overlap_threshold=overlap_threshold,
        normalized_xy_map=xy,
    )
    outputs = {k: _t(v) for k, v in planeTR_outputs_np.items()}
    bs = planeTR_outputs_np["pred_logits"].shape[0]
    query_feat = torch.zeros(bs, nq, 8)
    image_sizes = [(480, 640)] * bs
    return PlaneTR_NopeSAC._postprocess_planeHeadMask(
        fake, outputs, [None] * bs, batched_inputs, image_sizes, query_feat)


def _our_postprocess(planeTR_outputs_np, batched_inputs, nq):
    from nopesac_tpu.evaluation.postprocess import _compact_view
    from nopesac_tpu.models.nopesac import PlaneTRNopeSAC

    model = PlaneTRNopeSAC(num_queries=nq)
    outputs = {
        "pred_logits": jnp.asarray(planeTR_outputs_np["pred_logits"]),
        "pred_params": jnp.asarray(planeTR_outputs_np["pred_params"]),
        "pred_mask_logits": jnp.asarray(planeTR_outputs_np["pred_mask_logits"]),
        "pred_centers": jnp.zeros((1, nq, 2), jnp.float32),
    }
    sel = model.bind({"params": {}}).select_planes(outputs, out_h=480, out_w=640)
    view = {k: np.asarray(v) for k, v in sel.items()}
    return [_compact_view(view, i, bi["image_id"], bi["file_name"], 480, 640)
            for i, bi in enumerate(batched_inputs)]


def _make_outputs(rng, nq, case: str):
    """planeTR output dicts engineering each postprocess regime."""
    logits = rng.normal(size=(1, nq, 2)).astype(np.float32)
    if case == "zero":
        logits[..., 0] -= 8.0  # nothing clears the score threshold
    elif case == "normal":
        logits[0, : nq // 2, 0] += 4.0  # half the queries are planes
        logits[0, nq // 2:, 1] += 4.0
    elif case == "all_filtered":
        logits[0, :3, 0] += 4.0
        logits[0, 3:, 1] += 4.0
    params = rng.normal(size=(1, nq, 3)).astype(np.float32)
    masks = (rng.normal(size=(1, nq, 120, 160)) * 2.0).astype(np.float32)
    if case == "normal":
        # blocky confident masks so argmax regions are stable under the
        # two implementations' different interpolation orders
        masks[:] = -6.0
        for q in range(nq // 2):
            r0 = (q * 17) % 100
            c0 = (q * 29) % 130
            masks[0, q, r0:r0 + 22, c0:c0 + 28] = 6.0
    elif case == "all_filtered":
        masks[:] = -6.0
        # every valid query's argmax mask overlaps its original mask < 60%
        masks[0, 0, :40, :40] = 6.0
        masks[0, 1, :40, :40] = 6.5  # beats q0 everywhere it is confident
        masks[0, 2, 60:70, 60:70] = 6.2
        masks[0, 1, 60:70, 60:70] = 6.9  # and shadows q2 too
    return {"pred_logits": logits, "pred_params": params,
            "pred_mask_logits": masks}


class TestPostprocessExecuted:
    """_postprocess_planeHeadMask executed vs select_planes+_compact_view on
    identical tensors, all three regimes. Bilinear upsample differs at f32
    ulp level between XLA and torch, so masks near the 0.5 gate can flip on
    boundary pixels; the crafted inputs keep probabilities saturated."""

    @pytest.mark.parametrize("case", ["normal", "zero", "all_filtered"])
    def test_regime(self, case):
        nq = 8
        # str hash() is salted per process — a process-dependent seed made
        # this flake whenever an unlucky draw left a mask logit near the 0.5
        # gate; crc32 is stable across runs
        import zlib

        rng = np.random.default_rng(zlib.crc32(case.encode()))
        out_np = _make_outputs(rng, nq, case)
        batched_inputs = [{
            "image_id": "pair0_0", "file_name": "/x/y.jpg",
            "height": 480, "width": 640,
        }]
        ref = _ref_postprocess(out_np, batched_inputs, nq)[0]
        ours = _our_postprocess(out_np, batched_inputs, nq)[0]

        assert ours["pred_plane_oriIdxs"] == [int(i) for i in ref["pred_plane_oriIdxs"]], case
        record(f"pipeline: postprocess pred_plane [{case}] "
               "(siamese_planeTR.py:625-803)",
               np.asarray(ours["pred_plane"]), ref["pred_plane"].numpy(), 1e-6)
        record(f"pipeline: postprocess centers [{case}] "
               "(siamese_planeTR.py:726-739)",
               np.asarray(ours["pred_plane_ins_center"]),
               ref["pred_plane_ins_center"].numpy(), 1e-5)
        assert len(ours["instances"]) == len(ref["instances"])
        for k, (oi, ri) in enumerate(zip(ours["instances"], ref["instances"])):
            assert oi["segmentation"]["counts"] == ri["segmentation"]["counts"], \
                f"{case}: instance {k} RLE differs"
            np.testing.assert_allclose(oi["bbox"], ri["bbox"], atol=1e-6)
            np.testing.assert_allclose(oi["score"], ri["score"], atol=2e-6)
        # round 5: masks are no longer materialised host-side (the RLE is
        # built straight from the device label map) — decode our instances'
        # RLE and compare against the reference's dense masks, which is the
        # same assertion through a stricter wire format
        from nopesac_tpu.utils import rle as rle_util

        ref_masks = ref["pred_plane_masks"].numpy().astype(bool)
        ours_masks = np.stack([
            rle_util.decode({"size": oi["segmentation"]["size"],
                             "counts": oi["segmentation"]["counts"]})
            for oi in ours["instances"]]).astype(bool)
        np.testing.assert_array_equal(ours_masks, ref_masks)
        DIFFS[f"pipeline: postprocess instance RLE+bbox+masks [{case}] "
              "(siamese_planeTR.py:684-803)"] = 0.0


# ------------------------------------------------- full train-mode loss dict
class TestTrainLossDictExecuted:
    """The reference's FULL train-mode forward (siamese_planeTR.py:208-299) —
    per-view detection + criterion, GT corr matrix over pred indices, matching
    NLL, and the camera-loss zoo (pixelReg, AIM rec, 4 refine branches) —
    executed on the real instantiated meta-arch vs our train_forward with
    identical imported weights on a synthetic geometrically-consistent batch.

    Determinism: dropout zeroed on both sides (reference hardcodes 0.1,
    planeTR_head.py:80-88); RAND_ON off (torch/jax RNG streams can't match);
    each pair's two view images are made identical so trainable-BN batch
    statistics agree between the reference's per-view B batches and our
    concatenated 2B batch (the documented layout deviation,
    models/nopesac.py:187-193) — targets/poses/planes still differ per view.

    Shapes are the real 480x640 / bs=1: the reference PixelCameraHead is
    size-locked (the corr-softmax conv takes h2*w2=300 input channels and the
    fc towers flatten fixed spatial dims, camera_head.py:78-114), so no
    smaller fixture can execute it.
    """

    H, W = 480, 640

    @pytest.fixture(scope="class")
    def both(self, tmp_path_factory):
        from nopesac_tpu.config.config import get_cfg
        from nopesac_tpu.data.mapper import PairMapper, collate
        from nopesac_tpu.data.synthetic import make_dataset
        from nopesac_tpu.engine.trainer import build_model_from_cfg
        from nopesac_tpu.utils import rle as rle_util
        from nopesac_tpu.utils.torch_import import import_torch_weights

        tmp = tmp_path_factory.mktemp("trainloss")
        # plain-dict kmeans pickles: the ctor loads them unconditionally
        # (siamese_planeTR.py:119-128) but with CLASSIFICATION_ON=False they
        # are bookkeeping only — no sklearn needed to unpickle a dict
        km_t, km_r = tmp / "ktrans.pkl", tmp / "krots.pkl"
        with open(km_t, "wb") as f:
            pickle.dump({"cluster_centers_": np.zeros((32, 3))}, f)
        with open(km_r, "wb") as f:
            pickle.dump({"cluster_centers_": np.zeros((32, 4))}, f)

        cfg = get_cfg()
        cfg.MODEL.DEVICE = "cpu"
        cfg.MODEL.MASK_ON = True
        cfg.MODEL.EMBEDDING_ON = True
        cfg.MODEL.CAMERA_ON = True
        cfg.MODEL.DEPTH_ON = True
        cfg.MODEL.HUNGARIAN_MATCHER_ON = True
        cfg.MODEL.LOSS_DETECTION_ON = True
        cfg.MODEL.LOSS_CAMERA_ON = True
        cfg.MODEL.LOSS_EMB_ON = True
        cfg.MODEL.CAMERA_HEAD.NAME = "PlaneCameraHead"
        cfg.MODEL.CAMERA_HEAD.CAM_REC_ON = True
        cfg.MODEL.CAMERA_HEAD.REFINE_ON = True
        cfg.MODEL.CAMERA_HEAD.RAND_ON = False
        cfg.MODEL.CAMERA_HEAD.KMEANS_TRANS_PATH = str(km_t)
        cfg.MODEL.CAMERA_HEAD.KMEANS_ROTS_PATH = str(km_r)
        cfg.MODEL.SEM_SEG_HEAD.CENTER_ON = True
        cfg.MODEL.SEM_SEG_HEAD.PARAM_ON = True
        cfg.MODEL.SEM_SEG_HEAD.DROPOUT = 0.0

        h, w = self.H, self.W
        pairs = make_dataset(n_pairs=1, n_planes=6, h=h, w=w, seed=7)
        for p in pairs:
            p["1"]["image"] = p["0"]["image"]

        # ---------------- reference: instantiate + run the real meta-arch
        from NopeSAC_Net.modeling.meta_arch.siamese_planeTR import (
            PlaneTR_NopeSAC as RefMeta, get_coordinate_map)  # noqa: F401

        torch.manual_seed(3)
        ref = RefMeta(cfg)
        ref.train()
        for m in ref.modules():
            if isinstance(m, torch.nn.Dropout):
                m.p = 0.0
            if isinstance(m, torch.nn.MultiheadAttention):
                m.dropout = 0.0
        # the ctor precomputes the xy map at 480x640 (siamese_planeTR.py:805);
        # regenerate at the fixture size
        ref.precompute_xy_map(h=h, w=w)

        from detectron2.structures import Instances

        default_k = np.array([[517.97, 0, 320.0], [0, 517.97, 240.0],
                              [0, 0, 1.0]], np.float64)

        def ref_view(view):
            n = len(view["annotations"])
            sem = np.zeros((h, w), np.int64)
            for i, ann in enumerate(view["annotations"]):
                m = rle_util.seg_to_mask(ann["segmentation"], h, w)
                sem[m > 0] = i + 1
            inst = Instances((h, w))
            inst.gt_classes = torch.zeros(n, dtype=torch.long)
            inst.gt_planes = torch.tensor(
                [ann["plane"] for ann in view["annotations"]],
                dtype=torch.float32)
            return {
                "image": torch.from_numpy(
                    np.ascontiguousarray(
                        np.asarray(view["image"], np.float32).transpose(2, 0, 1))),
                "instances": inst,
                "semantic_map": torch.from_numpy(sem),
                "depth": torch.from_numpy(np.asarray(view["depth"], np.float32)),
                "camera_K": default_k,
            }

        batched_inputs = [{
            "0": ref_view(p["0"]), "1": ref_view(p["1"]),
            "rel_pose": p["rel_pose"], "gt_corrs": p["gt_corrs"],
        } for p in pairs]

        ckpt = tmp / "full.pth"
        torch.save({"model": ref.state_dict()}, str(ckpt))
        ref_losses = ref(batched_inputs)
        ref_losses = {k: float(v.detach()) for k, v in ref_losses.items()}

        # ---------------- ours: mapper -> wire batch -> train_forward
        mapper = PairMapper(is_train=True, dataset_kind="mp3d",
                            image_size=(h, w))
        batch = collate([mapper(p) for p in pairs])
        batch.pop("meta", None)
        batch = jax.tree_util.tree_map(jnp.asarray, batch)

        model = build_model_from_cfg(cfg)
        variables = model.init(
            {"params": jax.random.PRNGKey(0),
             "dropout": jax.random.PRNGKey(1)},
            batch, jax.random.PRNGKey(2), method=model.init_all)
        params, bstats = import_torch_weights(
            variables["params"], str(ckpt),
            batch_stats=variables.get("batch_stats", {}))
        our_losses, _ = model.apply(
            {"params": params, "batch_stats": bstats},
            batch, jax.random.PRNGKey(3),
            method=model.train_forward, mutable=["batch_stats"],
            rngs={"dropout": jax.random.PRNGKey(4)})
        our_losses = {k: float(v) for k, v in our_losses.items()}
        return ref_losses, our_losses

    def test_key_sets_match(self, both):
        ref_losses, our_losses = both
        assert set(our_losses) == set(ref_losses), (
            f"ours-only: {sorted(set(our_losses) - set(ref_losses))}; "
            f"ref-only: {sorted(set(ref_losses) - set(our_losses))}")

    def test_every_loss_term(self, both):
        ref_losses, our_losses = both
        failures = []
        for k in sorted(ref_losses):
            # camera-head losses sit at the end of a real-backbone (50-layer
            # f32) -> corr-volume-softmax -> pose-regressor -> hypothesis-warp
            # chain; with injected features the same modules match at 1e-7
            # (test_reference_parity), so the ~1e-2 drift here is f32
            # accumulation through the backbone, and those terms get a looser
            # gate than the detection/matching ones (observed max 9.5e-3)
            deep_chain = ("CamRef" in k or "CamRec" in k or "pixelReg" in k)
            tol = 2e-2 if deep_chain else 3e-3
            o, r = our_losses[k], ref_losses[k]
            diff = abs(o - r)
            DIFFS[f"pipeline: train loss {k} (siamese_planeTR.py:208-299)"] = diff
            if diff > tol + tol * abs(r):
                failures.append(f"{k}: ours={o:.6g} ref={r:.6g} diff={diff:.3g}")
        assert not failures, "train loss dict diverges:\n" + "\n".join(failures)
