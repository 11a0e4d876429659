"""Numeric parity against the reference's OWN torch code (/root/reference).

The reference's pure modules (camera_modules, matching_head sinkhorn,
criterion, matcher) are imported directly — with detectron2/fvcore/quaternion
stubbed by tests/refstubs.py — and evaluated on the SAME random inputs as the
nopesac_tpu implementations. This is the ground truth for the "within 1%"
north star: every formula the metrics flow through is checked to ~1e-5 here.

Each check records its max-abs diff in DIFFS; tools/parity_report.py renders
PARITY.md from a pytest run of this file.
"""
from __future__ import annotations

import os

import numpy as np
import pytest

torch = pytest.importorskip("torch")

pytestmark = pytest.mark.skipif(
    not os.path.isdir("/root/reference"), reason="reference checkout not mounted"
)

import refstubs  # noqa: F401  (installs stubs + sys.path; tests/ is on sys.path)

# reference code hardcodes .cuda() on host tensors (matching_head.py:274-281,
# a portability bug noted in SURVEY.md section 5); neutralise on this CPU box
torch.Tensor.cuda = lambda self, *a, **k: self

import jax
import jax.numpy as jnp

DIFFS: dict = {}


def record(name: str, ours, ref, tol: float):
    ours = np.asarray(ours, np.float64)
    ref = np.asarray(ref, np.float64)
    diff = float(np.max(np.abs(ours - ref))) if ours.size else 0.0
    DIFFS[name] = diff
    np.testing.assert_allclose(ours, ref, atol=tol, rtol=tol,
                               err_msg=f"{name} diverges from reference")
    return diff


def _t(x):
    return torch.from_numpy(np.asarray(x))


# ---------------------------------------------------------------- quaternion
class TestQuatAndWarp:
    def test_quat_to_rotmat(self):
        from NopeSAC_Net.modeling.camera_net import camera_modules as cm

        from nopesac_tpu.core import geometry as geo

        rng = np.random.default_rng(0)
        q = rng.normal(size=(32, 4)).astype(np.float32)  # deliberately non-unit
        ours = geo.quat_to_rotmat(jnp.asarray(q))
        ref = cm.quaternion2rotmatrix(_t(q))
        record("quat_to_rotmat (camera_modules.py:120)", ours, ref.numpy(), 1e-6)

    def test_quat_multiply(self):
        from NopeSAC_Net.modeling.camera_net import camera_modules as cm

        from nopesac_tpu.core import geometry as geo

        rng = np.random.default_rng(1)
        q1 = rng.normal(size=(16, 4)).astype(np.float32)
        q2 = rng.normal(size=(16, 4)).astype(np.float32)
        ours = geo.quat_multiply(jnp.asarray(q1), jnp.asarray(q2))
        ref = cm.QuaternionMultiplication(_t(q1), _t(q2))
        record("quat_multiply (camera_modules.py:199)", ours, ref.numpy(), 1e-6)

    def test_plane_warp(self):
        """warp_plane_param_to_global warps each view-0 plane through each of
        the n hypothesis poses; ours is one vmappable kernel."""
        from NopeSAC_Net.modeling.camera_net import camera_modules as cm

        from nopesac_tpu.core import geometry as geo

        rng = np.random.default_rng(2)
        bs, n = 3, 10
        geo_seq = rng.normal(size=(bs, n, 6)).astype(np.float32) * 2.0
        quat = rng.normal(size=(bs, n, 4)).astype(np.float32)
        quat /= np.linalg.norm(quat, axis=-1, keepdims=True)
        tran = rng.normal(size=(bs, n, 3)).astype(np.float32)

        ref_p0, ref_p1 = cm.warp_plane_param_to_global(
            _t(geo_seq), _t(quat), _t(tran))

        planes0 = jnp.asarray(geo_seq[:, :, :3])
        # ours: vmap over the n hypothesis poses; [bs, n(pose), n(plane), 3]
        ours_p0 = jax.vmap(
            jax.vmap(geo.warp_planes_to_global, in_axes=(None, 0, 0)),
        )(planes0, jnp.asarray(quat), jnp.asarray(tran))
        ours_p1 = jnp.broadcast_to(
            geo.warp_planes_identity(jnp.asarray(geo_seq[:, :, 3:]))[:, None],
            (bs, n, n, 3),
        )
        record("plane_warp view0 (camera_modules.py:164 / camera_head.py:1427)",
               ours_p0, ref_p0.reshape(bs, n, n, 3).numpy(), 2e-5)
        record("plane_warp view1 axis flip (camera_modules.py:195)",
               ours_p1, ref_p1.reshape(bs, n, n, 3).numpy(), 1e-6)


# ------------------------------------------------------------------ sinkhorn
class TestSinkhorn:
    @pytest.mark.parametrize("iters", [10, 200])
    def test_masked_ot(self, iters):
        from NopeSAC_Net.modeling.matching_net import matching_head as mh

        from nopesac_tpu.core.sinkhorn import log_optimal_transport_masked

        rng = np.random.default_rng(3)
        b, m, n = 4, 12, 9
        scores = (rng.normal(size=(b, m, n)) * 3).astype(np.float32)
        row_masks = rng.uniform(size=(b, m)) > 0.3
        col_masks = rng.uniform(size=(b, n)) > 0.3
        row_masks[:, :2] = True  # at least a couple valid
        col_masks[:, :2] = True
        alpha = np.float32(1.37)

        ref = mh.log_optimal_transport_withMask(
            _t(scores), _t(np.asarray(alpha)), iters,
            row_masks=_t(row_masks), col_masks=_t(col_masks))
        ours = log_optimal_transport_masked(
            jnp.asarray(scores), jnp.asarray(alpha), iters,
            row_masks=jnp.asarray(row_masks), col_masks=jnp.asarray(col_masks))
        # compare only entries that can ever be read downstream (valid rows/
        # cols + dustbin); masked entries are -inf-ish sentinels on both sides
        rm = np.concatenate([row_masks, np.ones((b, 1), bool)], 1)
        cm_ = np.concatenate([col_masks, np.ones((b, 1), bool)], 1)
        sel = rm[:, :, None] & cm_[:, None, :]
        record(f"masked_sinkhorn iters={iters} (matching_head.py:259)",
               np.asarray(ours)[sel], ref.numpy()[sel], 5e-5)

    def test_mutual_max_assignment(self):
        from NopeSAC_Net.modeling.camera_net import camera_modules as cm

        from nopesac_tpu.core.assignment import mutual_max_assignment

        rng = np.random.default_rng(4)
        m, n = 11, 11  # reference asserts bs == 1 (camera_modules.py:27)
        for trial in range(4):
            logs = np.log(rng.uniform(0.01, 1.0, size=(1, m + 1, n + 1))).astype(np.float32)
            ref = cm.get_assignment_matrix(_t(logs), 0.2)
            ours = mutual_max_assignment(jnp.asarray(logs), 0.2)
            record("mutual_max_assignment (camera_modules.py:15)",
                   ours, ref.numpy(), 1e-6)


# ------------------------------------------------- matcher + criterion losses
def _make_det_fixture(seed=5, b=2, nq=8, ng_list=(3, 5), h=24, w=32, gh=48, gw=64):
    """Random detection outputs/targets in both layouts.

    Returns (ours_outputs, ours_targets, ref_outputs, ref_targets, num_masks).
    GT masks are disjoint (grid cells), as the pipeline guarantees.
    """
    rng = np.random.default_rng(seed)
    ng_max = max(ng_list)

    logits = rng.normal(size=(b, nq, 2)).astype(np.float32)
    mask_logits = rng.normal(size=(b, nq, h, w)).astype(np.float32)
    centers = rng.uniform(size=(b, nq, 2)).astype(np.float32)
    params = rng.normal(size=(b, nq, 3)).astype(np.float32)
    pixel_centers = rng.uniform(size=(b, h, w, 2)).astype(np.float32)
    pixel_depth = rng.uniform(0.5, 5.0, size=(b, h, w, 1)).astype(np.float32)

    gt_masks = np.zeros((b, ng_max, gh, gw), np.uint8)
    gt_params = np.zeros((b, ng_max, 3), np.float32)
    gt_centers = np.zeros((b, ng_max, 2), np.float32)
    gt_valid = np.zeros((b, ng_max), bool)
    gt_pixel_centers = rng.uniform(size=(b, gh, gw, 2)).astype(np.float32)
    depth = rng.uniform(0.5, 5.0, size=(b, gh, gw)).astype(np.float32)
    kmap = rng.normal(size=(b, 3, gh, gw)).astype(np.float32)

    for bi, ng in enumerate(ng_list):
        cell = gw // ng
        for g in range(ng):
            gt_masks[bi, g, :, g * cell:(g + 1) * cell] = 1
            gt_valid[bi, g] = True
        gt_params[bi, :ng] = rng.normal(size=(ng, 3)) * 1.5
        gt_centers[bi, :ng] = rng.uniform(size=(ng, 2))
    # make depth consistent with the GT planes inside their masks so the
    # q-loss valid-region gate (|p/|p|^2 . X - 1| < 0.2) passes for most
    # covered pixels: X = kmap * depth, so depth = 1 / (p_new . kmap).
    # Pixels with a near-zero denominator keep the random depth and exercise
    # the gate's reject branch.
    for bi in range(b):
        for g in range(ng_list[bi]):
            p = gt_params[bi, g]
            p_new = p / max(float(p @ p), 1e-8)
            denom = np.einsum("c,chw->hw", p_new, kmap[bi])
            consistent = np.where(np.abs(denom) > 0.2, 1.0 / np.where(
                np.abs(denom) > 0.2, denom, 1.0), depth[bi])
            depth[bi] = np.where(gt_masks[bi, g] > 0, consistent, depth[bi])

    ours_outputs = {
        "pred_logits": jnp.asarray(logits),
        "pred_mask_logits": jnp.asarray(mask_logits),
        "pred_centers": jnp.asarray(centers),
        "pred_params": jnp.asarray(params),
        "pixel_centers": jnp.asarray(pixel_centers),
        "pixel_depth": jnp.asarray(pixel_depth),
    }
    ours_targets = {
        "gt_valid": jnp.asarray(gt_valid),
        "gt_masks": jnp.asarray(gt_masks),
        "gt_params": jnp.asarray(gt_params),
        "gt_centers": jnp.asarray(gt_centers),
        "gt_pixel_centers": jnp.asarray(gt_pixel_centers),
        "depth": jnp.asarray(depth),
        "k_inv_dot_xy1": jnp.asarray(kmap),
    }

    ref_outputs = {
        "pred_logits": _t(logits),
        "pred_mask_logits": _t(mask_logits),
        "pred_centers": _t(centers),
        "pred_params": _t(params),
        "pixel_centers": _t(pixel_centers.transpose(0, 3, 1, 2)),
        "pixel_depth": _t(pixel_depth.transpose(0, 3, 1, 2)),
    }
    ref_targets = []
    for bi, ng in enumerate(ng_list):
        ref_targets.append({
            "labels": torch.zeros(ng, dtype=torch.int64),
            "masks": _t(gt_masks[bi, :ng].astype(np.float32)),
            "plane_centers": _t(gt_centers[bi, :ng]),
            "plane_params": _t(gt_params[bi, :ng]),
            "pixel_centers": _t(gt_pixel_centers[bi].transpose(2, 0, 1)),
            "valid_region": None,
            "depth": _t(depth[bi]),
            "k_inv_dot_xy1": _t(kmap[bi]),
        })
    num_masks = float(sum(ng_list))
    return ours_outputs, ours_targets, ref_outputs, ref_targets, num_masks


WEIGHTS = {
    "cost_class": 1.0, "cost_mask": 20.0, "cost_dice": 1.0, "cost_center": 0.5,
    "cost_param": 0.25, "cost_param_offset": 0.01, "cost_param_normal_angle": 0.0028,
}


def _ref_matcher():
    from NopeSAC_Net.modeling.matcher import HungarianMatcher

    return HungarianMatcher(
        cost_class=WEIGHTS["cost_class"], cost_mask=WEIGHTS["cost_mask"],
        cost_dice=WEIGHTS["cost_dice"], cost_center=WEIGHTS["cost_center"],
        cost_param=WEIGHTS["cost_param"],
        cost_param_offset=WEIGHTS["cost_param_offset"],
        cost_param_normal_angle=WEIGHTS["cost_param_normal_angle"],
    )


class TestMatcherParity:
    def test_assignments_identical(self):
        from nopesac_tpu.losses.criterion import match_planes

        oo, ot, ro, rt, _ = _make_det_fixture()
        ref_idx = _ref_matcher()(ro, rt)
        ours = np.asarray(match_planes(oo, ot, WEIGHTS))  # [B, NQ] gt or -1

        same = True
        for bi, (src, tgt) in enumerate(ref_idx):
            ref_pairs = set(zip(src.numpy().tolist(), tgt.numpy().tolist()))
            our_pairs = {(q, int(ours[bi, q])) for q in range(ours.shape[1])
                         if ours[bi, q] >= 0}
            same = same and (ref_pairs == our_pairs)
        DIFFS["hungarian_assignment (matcher.py:104, exact set equality)"] = (
            0.0 if same else 1.0)
        assert same, f"assignments differ: ref={ref_idx} ours={ours}"


class TestCriterionParity:
    def _both(self, seed):
        from NopeSAC_Net.modeling.criterion import SetCriterion

        from nopesac_tpu.losses.criterion import (
            depth_loss, detection_losses, match_planes)

        oo, ot, ro, rt, num_masks = _make_det_fixture(seed=seed)
        crit = SetCriterion(
            num_classes=1, matcher=_ref_matcher(),
            weight_dict={}, eos_coef=0.1,
            losses=["labels", "masks", "centers", "params", "depth"],
            losses_aux=["labels", "masks", "centers", "params"],
        )
        ref_losses, _ = crit(ro, rt)

        match = match_planes(oo, ot, WEIGHTS)
        ours = detection_losses(oo, ot, match, jnp.asarray(num_masks))
        ours["loss_depth_pixel"] = depth_loss(oo, ot)
        return ours, ref_losses

    @pytest.mark.parametrize("seed", [5, 11])
    def test_losses(self, seed):
        ours, ref = self._both(seed)
        keymap = {
            "loss_ce": "loss_ce", "loss_mask": "loss_mask",
            "loss_dice": "loss_dice", "loss_center_ins": "loss_center_ins",
            "loss_center_pixel": "loss_center_pixel",
            "loss_param_l1": "loss_param_l1", "loss_param_cos": "loss_param_cos",
            "loss_q": "loss_q", "loss_depth_pixel": "loss_depth_pixel",
        }
        for ok, rk in keymap.items():
            record(f"criterion {ok} (criterion.py:75-245) seed={seed}",
                   float(ours[ok]), float(ref[rk]), 5e-5)


class TestMatchingHeadForward:
    """Full MatchingHead forward — GNN + projections + geometry prior +
    masked Sinkhorn — with the SAME weights on both sides (torch state_dict
    imported through utils/torch_import.py)."""

    def test_forward_parity(self, tmp_path):
        from NopeSAC_Net.modeling.matching_net.matching_head import MatchingHead as RefMH

        from nopesac_tpu.config.config import get_cfg
        from nopesac_tpu.models.matching_head import MatchingHead as OurMH
        from nopesac_tpu.utils.torch_import import import_torch_weights

        torch.manual_seed(0)
        cfg = get_cfg()
        ref = RefMH(cfg).eval()
        ckpt = tmp_path / "mh.pth"
        torch.save({"model": {f"matching_head.{k}": v
                              for k, v in ref.state_dict().items()}}, str(ckpt))

        rng = np.random.default_rng(7)
        b, n = 2, 12
        app1 = rng.normal(size=(b, n, 256)).astype(np.float32)
        app2 = rng.normal(size=(b, n, 256)).astype(np.float32)
        params1 = (rng.normal(size=(b, n, 3)) * 1.5).astype(np.float32)
        params2 = (rng.normal(size=(b, n, 3)) * 1.5).astype(np.float32)
        quat = rng.normal(size=(b, 4)).astype(np.float32)
        quat /= np.linalg.norm(quat, axis=-1, keepdims=True)
        cam = np.concatenate([rng.normal(size=(b, 3)).astype(np.float32), quat], -1)
        row_valid = np.zeros((b, n), bool)
        col_valid = np.zeros((b, n), bool)
        row_valid[:, :7] = True
        col_valid[:, :9] = True

        indices1 = [(torch.arange(7), torch.arange(7)) for _ in range(b)]
        indices2 = [(torch.arange(9), torch.arange(9)) for _ in range(b)]
        with torch.no_grad():
            _, ref_scores = ref(
                _t(app1), _t(app2), _t(cam), _t(params1), _t(params2),
                indices1=indices1, indices2=indices2)

        ours_mod = OurMH(sinkhorn_iterations=200)
        variables = ours_mod.init(
            jax.random.PRNGKey(0), jnp.asarray(app1), jnp.asarray(app2),
            jnp.asarray(cam), jnp.asarray(params1), jnp.asarray(params2),
            jnp.asarray(row_valid), jnp.asarray(col_valid))
        tree = import_torch_weights({"matching_head": variables["params"]}, str(ckpt))
        # every reference tensor must land (silent partial import would
        # trivially "pass" with random weights on the untouched branches)
        flat_ref = len(ref.state_dict())
        flat_set = sum(
            int(not np.allclose(a, b_))
            for a, b_ in zip(
                jax.tree_util.tree_leaves(
                    jax.tree_util.tree_map(np.asarray, variables["params"])),
                jax.tree_util.tree_leaves(tree["matching_head"]))
        )
        assert flat_set > 0, "import was a no-op"
        ours = ours_mod.apply(
            {"params": tree["matching_head"]}, jnp.asarray(app1), jnp.asarray(app2),
            jnp.asarray(cam), jnp.asarray(params1), jnp.asarray(params2),
            jnp.asarray(row_valid), jnp.asarray(col_valid))

        rm = np.concatenate([row_valid, np.ones((b, 1), bool)], 1)
        cm_ = np.concatenate([col_valid, np.ones((b, 1), bool)], 1)
        sel = rm[:, :, None] & cm_[:, None, :]
        record(
            f"MatchingHead full forward [{flat_ref} torch tensors] "
            "(matching_head.py:43-133)",
            np.asarray(ours)[sel], ref_scores.numpy()[sel], 5e-4)


class TestCameraRefineForward:
    """PlaneCamRefHead inference refine — one-plane hypotheses, scoring,
    soft fusion — with the SAME weights on both sides."""

    def test_refine_soft_parity(self, tmp_path):
        from detectron2.layers import ShapeSpec

        from NopeSAC_Net.modeling.camera_net.camera_head import PlaneCameraHead as RefCH

        from nopesac_tpu.config.config import get_cfg
        from nopesac_tpu.models.camera_head import (
            PlaneCameraHead as OurCH, compute_sig_seq, warp_geo_sequence)
        from nopesac_tpu.utils.torch_import import import_torch_weights

        cfg = get_cfg()
        cfg.MODEL.CAMERA_HEAD.CAM_REC_ON = True
        cfg.MODEL.CAMERA_HEAD.REFINE_ON = True
        input_shape = {
            f"res{i}": ShapeSpec(channels=c, stride=s)
            for i, c, s in ((2, 256, 4), (3, 512, 8), (4, 1024, 16), (5, 2048, 32))
        }
        torch.manual_seed(1)
        ref = RefCH(cfg, input_shape).eval()
        ckpt = tmp_path / "ch.pth"
        torch.save({"model": {f"camera_head_list.0.{k}": v
                              for k, v in ref.state_dict().items()}}, str(ckpt))

        rng = np.random.default_rng(9)
        b, nq, m = 1, 50, 6
        tf = rng.normal(size=(b, 256)).astype(np.float32)
        rf = rng.normal(size=(b, 256)).astype(np.float32)
        init_t = (rng.normal(size=(b, 3)) * 0.5).astype(np.float32)
        init_r = rng.normal(size=(b, 4)).astype(np.float32)
        init_r /= np.linalg.norm(init_r, axis=-1, keepdims=True)
        geo_local = np.zeros((b, nq, 6), np.float32)
        geo_local[:, :m] = (rng.normal(size=(b, m, 6)) * 1.5).astype(np.float32)
        seq_valid = np.zeros((b, nq), bool)
        seq_valid[:, :m] = True

        # reference: geo warp + sig-seq exactly as forawrd_refineLoop does
        # (camera_head.py:352-369), then the mangled inference refine
        cams = {"tran": _t(init_t), "rot": _t(init_r)}
        geo_global_ref = ref.get_gt_global_geo_sequence(_t(geo_local), pred_cams=cams)
        cams_aux = {"tran": torch.zeros_like(cams["tran"]), "rot": cams["rot"]}
        geo_global_aux = ref.get_gt_global_geo_sequence(_t(geo_local), pred_cams=cams_aux)
        sig_ref = ((geo_global_ref[:, :, 0:1] * geo_global_aux[:, :, 0:1]) >= 0).float()
        sig_ref = (sig_ref - 0.5) * 2.0
        with torch.no_grad():
            _, pred_cam = ref._PlaneCameraHead__inference_PlaneCamRefHead(
                _t(tf), _t(rf), geo_global_ref,
                geo_sequence_local=_t(geo_local), matched_nums=[m],
                out_cam_type="soft", sig_seq=sig_ref,
                initial_trans=_t(init_t), initial_rot=_t(init_r))

        # ours: same pipeline through the batched refine kernel
        our = OurCH(num_queries=nq)
        geo_j = jnp.asarray(geo_local)
        tran_j, rot_j = jnp.asarray(init_t), jnp.asarray(init_r)
        geo_global = warp_geo_sequence(geo_j, tran_j, rot_j)
        sig = compute_sig_seq(geo_j, tran_j, rot_j)
        record("refine sig_seq (camera_head.py:367-368)",
               np.asarray(sig), sig_ref.numpy(), 1e-6)
        record("refine geo warp (camera_head.py:1335-1350)",
               np.asarray(geo_global), geo_global_ref.numpy(), 2e-5)

        args = (jnp.asarray(tf), jnp.asarray(rf), tran_j, rot_j, geo_j,
                jnp.asarray(seq_valid), sig, geo_global, False)
        variables = our.init(jax.random.PRNGKey(0), *args, method=OurCH.refine)
        tree = import_torch_weights({"camera_head": variables["params"]}, str(ckpt))
        out = our.apply({"params": tree["camera_head"]}, *args, method=OurCH.refine)

        nt = len(ref.state_dict())
        record(f"CamRefHead soft tran [{nt} torch tensors] (camera_head.py:925-1115)",
               np.asarray(out["tran_soft"]), pred_cam["pred_trans"].numpy(), 2e-4)
        record("CamRefHead soft rot (camera_head.py:925-1115)",
               np.asarray(out["rot_soft"]), pred_cam["pred_rot"].numpy(), 2e-4)
        record("CamRefHead hypothesis poses (camera_head.py:783-794)",
               np.asarray(out["trans_all"])[:, : m + 1],
               pred_cam["all_pred_trans"].numpy(), 2e-4)
        record("CamRefHead hypothesis scores (camera_head.py:813-848)",
               np.asarray(out["score_trans"])[:, : m + 1],
               pred_cam["score_soft_offset"].numpy()[..., 0], 2e-4)
        record("CamRefHead avg pose (camera_head.py:1045-1066)",
               np.asarray(out["tran_avg_incl"]),
               pred_cam["pred_trans_avg"].numpy(), 2e-4)


def _save_ref_ckpt_with_perturbed_bn(ref, prefix, path, seed_offset=0):
    """Perturb BN running stats (makes the batch_stats import load-bearing:
    fresh modules have mean=0/var=1 on both sides) and save the state_dict
    under the reference checkpoint's key prefix."""
    for m in ref.modules():
        if isinstance(m, torch.nn.BatchNorm2d):
            m.running_mean.data.normal_(0.0, 0.5)
            m.running_var.data.uniform_(0.5, 1.5)
    ref = ref.eval()
    torch.save({"model": {f"{prefix}.{k}": v
                          for k, v in ref.state_dict().items()}}, str(path))
    return ref


class TestPlaneHeadForward:
    """Full PlaneTR detection head — sine pos-emb, 6-layer post-norm encoder,
    6-layer pre-norm decoder, top_down(+depth) FPN with BatchNorm, and all
    output branches — with the SAME weights AND BN running stats on both
    sides (planeTR_head.py:24-252)."""

    def test_forward_parity(self, tmp_path):
        from detectron2.layers import ShapeSpec

        from NopeSAC_Net.modeling.planeTR_net.planeTR_head import PlaneTRHead as RefPH

        from nopesac_tpu.config.config import get_cfg
        from nopesac_tpu.models.plane_head import PlaneTRHead as OurPH
        from nopesac_tpu.utils.torch_import import import_torch_weights

        cfg = get_cfg()
        cfg.MODEL.DEPTH_ON = True
        cfg.MODEL.SEM_SEG_HEAD.PARAM_ON = True
        cfg.MODEL.SEM_SEG_HEAD.CENTER_ON = True
        input_shape = {
            f"res{i}": ShapeSpec(channels=c, stride=s)
            for i, c, s in ((2, 256, 4), (3, 512, 8), (4, 1024, 16), (5, 2048, 32))
        }
        torch.manual_seed(2)
        ckpt = tmp_path / "ph.pth"
        ref = _save_ref_ckpt_with_perturbed_bn(
            RefPH(cfg, input_shape), "sem_seg_head", ckpt)

        rng = np.random.default_rng(4)
        b = 2
        dims = {"res2": (256, 32, 40), "res3": (512, 16, 20),
                "res4": (1024, 8, 10), "res5": (2048, 4, 5)}
        feats = {k: (rng.normal(size=(b, c, h, w)) * 0.5).astype(np.float32)
                 for k, (c, h, w) in dims.items()}
        with torch.no_grad():
            ref_out, ref_hs = ref({k: _t(v) for k, v in feats.items()})

        ours_mod = OurPH(depth_on=True)
        feats_j = {k: jnp.asarray(np.transpose(v, (0, 2, 3, 1)))
                   for k, v in feats.items()}
        variables = ours_mod.init(jax.random.PRNGKey(0), feats_j)
        params, bstats = import_torch_weights(
            {"plane_head": variables["params"]}, str(ckpt),
            batch_stats={"plane_head": variables.get("batch_stats", {})})
        # sanity: the import touched both collections (leaf-by-leaf counting
        # is unreliable — zero-init biases / unit LayerNorm scales are
        # identical on both sides; the forward parity below with random
        # weights AND perturbed running stats is the real completeness check)
        n_ref = len(ref.state_dict())
        changed = lambda a, b_: sum(
            int(not np.allclose(x, y)) for x, y in zip(
                jax.tree_util.tree_leaves(jax.tree_util.tree_map(np.asarray, a)),
                jax.tree_util.tree_leaves(b_), strict=True))
        assert changed(variables["params"], params["plane_head"]) > 50
        assert changed(variables.get("batch_stats", {}), bstats["plane_head"]) == \
            len(jax.tree_util.tree_leaves(bstats["plane_head"]))
        out, hs = ours_mod.apply(
            {"params": params["plane_head"], "batch_stats": bstats["plane_head"]},
            feats_j)

        record(f"PlaneTRHead pred_logits [{n_ref} torch tensors] "
               "(planeTR_head.py:116-192)",
               np.asarray(out["pred_logits"]), ref_out["pred_logits"].numpy(), 2e-3)
        record("PlaneTRHead decoder embedding hs (planeTR_head.py:137-140)",
               np.asarray(hs), ref_hs.numpy(), 2e-3)
        record("PlaneTRHead pred_params (planeTR_head.py:157)",
               np.asarray(out["pred_params"]), ref_out["pred_params"].numpy(), 2e-3)
        record("PlaneTRHead pred_centers (planeTR_head.py:159-160)",
               np.asarray(out["pred_centers"]), ref_out["pred_centers"].numpy(), 1e-3)
        record("PlaneTRHead pixel_centers (planeTR_head.py:161-162)",
               np.asarray(out["pixel_centers"]),
               np.transpose(ref_out["pixel_centers"].numpy(), (0, 2, 3, 1)), 1e-3)
        record("PlaneTRHead mask logits einsum (planeTR_head.py:150)",
               np.asarray(out["pred_mask_logits"]),
               ref_out["pred_mask_logits"].numpy(), 5e-3)
        record("PlaneTRHead pixel_depth (planeTR_head.py:163-165)",
               np.asarray(out["pixel_depth"])[..., 0],
               ref_out["pixel_depth"].numpy()[:, 0], 2e-3)


class TestPixelCameraHeadForward:
    """Pose Regression Network — MaskFormer pixel decoder, conv stacks with
    BatchNorm, 4D correlation softmax, pose regressors — with the SAME
    weights AND BN running stats on both sides (camera_head.py:641-683)."""

    def test_forward_parity(self, tmp_path):
        from detectron2.layers import ShapeSpec

        from NopeSAC_Net.modeling.camera_net.camera_head import PlaneCameraHead as RefCH

        from nopesac_tpu.config.config import get_cfg
        from nopesac_tpu.models.camera_head import PlaneCameraHead as OurCH
        from nopesac_tpu.utils.torch_import import import_torch_weights

        cfg = get_cfg()
        cfg.MODEL.CAMERA_HEAD.CAM_REC_ON = True
        cfg.MODEL.CAMERA_HEAD.REFINE_ON = True
        input_shape = {
            f"res{i}": ShapeSpec(channels=c, stride=s)
            for i, c, s in ((2, 256, 4), (3, 512, 8), (4, 1024, 16), (5, 2048, 32))
        }
        torch.manual_seed(3)
        ckpt = tmp_path / "pch.pth"
        ref = _save_ref_ckpt_with_perturbed_bn(
            RefCH(cfg, input_shape), "camera_head_list.0", ckpt)

        # the conv stacks hardcode the 480x640 token geometry: corr channels
        # = 15*20 = 300 (camera_head.py:97-105), so res3 must be 60x80
        rng = np.random.default_rng(5)
        b = 1
        dims = {"res3": (512, 60, 80), "res4": (1024, 30, 40),
                "res5": (2048, 15, 20)}
        f1 = {k: (rng.normal(size=(b, c, h, w)) * 0.3).astype(np.float32)
              for k, (c, h, w) in dims.items()}
        f2 = {k: (rng.normal(size=(b, c, h, w)) * 0.3).astype(np.float32)
              for k, (c, h, w) in dims.items()}
        with torch.no_grad():
            _, pred_cam, pose_feats = ref._PlaneCameraHead__forward_PixelCameraHead(
                {k: _t(v) for k, v in f1.items()}, {k: _t(v) for k, v in f2.items()})

        ours_mod = OurCH(num_queries=50)
        feats_cat = {k: jnp.asarray(np.transpose(
            np.concatenate([f1[k], f2[k]], 0), (0, 2, 3, 1))) for k in dims}
        variables = ours_mod.init(jax.random.PRNGKey(0), feats_cat,
                                  method=OurCH.pixel_camera)
        params, bstats = import_torch_weights(
            {"camera_head": variables["params"]}, str(ckpt),
            batch_stats={"camera_head": variables.get("batch_stats", {})})
        out = ours_mod.apply(
            {"params": params["camera_head"], "batch_stats": bstats["camera_head"]},
            feats_cat, method=OurCH.pixel_camera)

        nt = len(ref.state_dict())
        record(f"PixelCameraHead tran [{nt} torch tensors] (camera_head.py:641-683)",
               np.asarray(out["tran"]), pred_cam["pred_trans"].numpy(), 1e-4)
        record("PixelCameraHead rot (camera_head.py:666-667)",
               np.asarray(out["rot"]), pred_cam["pred_rot"].numpy(), 1e-4)
        record("PixelCameraHead trans_feat (camera_head.py:653-657)",
               np.asarray(out["tran_feat"]), pose_feats["trans_feat"].numpy(), 1e-4)
        record("PixelCameraHead rots_feat (camera_head.py:659-662)",
               np.asarray(out["rot_feat"]), pose_feats["rots_feat"].numpy(), 1e-4)


class TestBackboneImport:
    """d2 ResNet-50 backbone — stem 7x7/2 + FrozenBN + maxpool, bottleneck
    stages res2-res5 with stride-on-3x3 (STRIDE_IN_1X1=False) — against a
    d2-faithful torch ResNet (refstubs.RefResNet50, clean-room from
    /root/reference/configs/Base.yaml:1-12) with the SAME weights and
    perturbed BN statistics imported through utils/torch_import.py. This is
    the path released checkpoints (README.md:70) take into models/resnet.py."""

    def test_feature_parity(self, tmp_path):
        from detectron2.modeling.backbone import RefResNet50

        from nopesac_tpu.models.resnet import ResNet
        from nopesac_tpu.utils.torch_import import import_torch_weights

        torch.manual_seed(7)
        ref = RefResNet50()
        # random conv weights (default torch init) + perturbed frozen stats:
        # fresh FrozenBN has mean=0/var=1 on both sides, which would hide a
        # broken stats import
        rng_t = torch.Generator().manual_seed(11)
        for name, buf in ref.named_buffers():
            if name.endswith("running_mean"):
                buf.data.normal_(0.0, 0.5, generator=rng_t)
            elif name.endswith("running_var"):
                buf.data.uniform_(0.5, 1.5, generator=rng_t)
        ref = ref.eval()
        ckpt = tmp_path / "bb.pth"
        torch.save({"model": {f"backbone.{k}": v
                              for k, v in ref.state_dict().items()}}, str(ckpt))

        rng = np.random.default_rng(6)
        img = (rng.normal(size=(2, 3, 96, 128)) * 0.7).astype(np.float32)
        with torch.no_grad():
            ref_feats = ref(_t(img))

        ours_mod = ResNet()
        img_j = jnp.asarray(np.transpose(img, (0, 2, 3, 1)))
        variables = ours_mod.init(jax.random.PRNGKey(0), img_j)
        tree = import_torch_weights({"backbone": variables["params"]}, str(ckpt))
        # every leaf must have been overwritten: conv kernels are random on
        # both sides, BN stats perturbed — anything untouched diverges below,
        # but check leaf count too so silent no-op imports can't pass
        n_torch = len(ref.state_dict())
        n_flax = len(jax.tree_util.tree_leaves(tree["backbone"]))
        assert n_torch == n_flax, (n_torch, n_flax)

        feats = ours_mod.apply({"params": tree["backbone"]}, img_j)
        for name in ("res2", "res3", "res4", "res5"):
            ref_nhwc = np.transpose(ref_feats[name].numpy(), (0, 2, 3, 1))
            record(
                f"ResNet-50 {name} [{n_torch} torch tensors] "
                "(d2 build_resnet_backbone, Base.yaml:4-12)",
                np.asarray(feats[name]), ref_nhwc,
                {"res2": 1e-4, "res3": 2e-4, "res4": 5e-4, "res5": 1e-3}[name])


def teardown_module(module):
    """Append this run's diffs where tools/parity_report.py can pick them up."""
    import json

    out = os.path.join(os.path.dirname(__file__), "..", ".parity_diffs.json")
    existing = {}
    if os.path.exists(out):
        with open(out) as f:
            existing = json.load(f)
    existing.update(DIFFS)
    with open(out, "w") as f:
        json.dump(existing, f, indent=1, sort_keys=True)
