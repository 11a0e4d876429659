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
        ref_masks = ref["pred_plane_masks"].numpy().astype(bool)
        np.testing.assert_array_equal(
            np.asarray(ours["pred_plane_masks"]).astype(bool), ref_masks)
        DIFFS[f"pipeline: postprocess instance RLE+bbox+masks [{case}] "
              "(siamese_planeTR.py:684-803)"] = 0.0
