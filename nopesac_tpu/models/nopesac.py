"""PlaneTR_NopeSAC meta-architecture (flax), fixed-shape TPU-first.

Spec: modeling/meta_arch/siamese_planeTR.py:34-839. Differences by design:
  * All paths operate on fixed shapes: NQ=50 plane slots per view with
    validity masks instead of compacted variable-length lists; inference is
    batched (the reference enforces bs=1, siamese_planeTR.py:340).
  * Image normalisation happens in the input pipeline; this module takes
    already-normalised NHWC float images.
  * Device/host split: `inference` returns fixed-shape tensors (masks at full
    resolution, validity, params, scores, camera dict); RLE encoding and
    instance-dict assembly live in evaluation/postprocess.py on host.
"""
from __future__ import annotations

from typing import Any, Dict, Optional

import jax
import jax.numpy as jnp
from flax import linen as nn

from ..core.assignment import mutual_max_assignment
from ..core.geometry import canonicalize_quat_sign, normalize
from ..data.packing import unpack_targets
from ..losses import camera_losses as CL
from ..losses import criterion as CR
from ..ops.select_pallas import fused_select_maps
from ..losses.matching import (
    build_pred_corr_matrix,
    intersect_with_valid,
    matching_nll_loss,
)
from .camera_head import (
    PlaneCameraHead,
    build_geo_sequence,
    build_gt_geo_sequence,
    compute_sig_seq,
    warp_geo_sequence,
)
from .matching_head import MatchingHead, geometric_distances
from .plane_head import PlaneTRHead
from .resnet import ResNet

Dtype = Any


class PlaneTRNopeSAC(nn.Module):
    """Siamese plane detection + matching + NOPE-SAC pose estimation."""

    num_queries: int = 50
    embedding_on: bool = True
    camera_on: bool = True
    depth_on: bool = False
    cam_rec_on: bool = True
    cam_ref_on: bool = True
    warp_plane_in_cam_ref_on: bool = True
    sinkhorn_iterations: int = 200
    offset_multiplier: float = 4.0
    normal_multiplier: float = 8.0
    plane_score_threshold: float = 0.6
    mask_prob_threshold: float = 0.5
    overlap_threshold: float = 0.6
    matching_score_threshold: float = 0.2
    inference_out_cam_type: str = "soft"
    transformer_dropout: float = 0.1
    dtype: Dtype = jnp.float32
    axis_name: Optional[str] = None
    # train-mode activation rematerialisation for the backbone (MODEL.REMAT);
    # required to fit the reference's bs=16 (SOLVER.IMS_PER_BATCH) on one v5e
    remat_backbone: bool = True
    # train-mode backbone block-interior dtype (MODEL.BACKBONE_TRAIN_DTYPE).
    # The residual trunk stays f32 either way — see resnet.py's policy note.
    backbone_train_dtype: Dtype = jnp.float32
    fpn_train_dtype: Dtype = jnp.float32  # MODEL.FPN_TRAIN_DTYPE (plane_head)

    # ---- training switches & loss weights (config.py / train yamls) ----
    loss_detection_on: bool = True
    loss_camera_on: bool = True
    loss_matching_on: bool = True
    matcher_on: bool = True
    rand_on: bool = True
    rand_bs: int = 64
    no_object_weight: float = 0.1
    dice_weight: float = 1.0
    mask_weight: float = 20.0
    param_weight_l1: float = 0.25
    param_weight_cos: float = 1.0
    param_hm_weight_l1: float = 0.25
    param_weight_q: float = 1.0
    center_ins_weight: float = 0.5
    param_weight_angle: float = 0.0028
    param_weight_offset: float = 0.01
    initial_cam_weight: float = 1.0
    plane_cam_weight: float = 1.0
    plane_cam_weight_predplane: float = 0.1

    def setup(self):
        self.backbone = ResNet(dtype=self.dtype, remat=self.remat_backbone,
                               train_block_dtype=self.backbone_train_dtype)
        self.plane_head = PlaneTRHead(
            num_queries=self.num_queries,
            depth_on=self.depth_on,
            dropout=self.transformer_dropout,
            dtype=self.dtype,
            fpn_train_dtype=self.fpn_train_dtype,
            axis_name=self.axis_name,
        )
        if self.embedding_on:
            # f32 even under bf16 compute: the GNN runs on <=51 tokens (~1%
            # of model FLOPs) and the iterated Sinkhorn normalisation + the
            # arccos geometric prior are exactly the ops bf16 rounding breaks
            # (see plane_head.py's head_dtype note for the measured failure)
            self.matching_head = MatchingHead(
                offset_multiplier=self.offset_multiplier,
                normal_multiplier=self.normal_multiplier,
                sinkhorn_iterations=self.sinkhorn_iterations,
                dtype=jnp.float32,
            )
        if self.camera_on:
            self.camera_head = PlaneCameraHead(
                num_queries=self.num_queries,
                cam_rec_on=self.cam_rec_on,
                cam_ref_on=self.cam_ref_on,
                warp_plane_in_cam_ref_on=self.warp_plane_in_cam_ref_on,
                dtype=self.dtype,
                axis_name=self.axis_name,
            )

    # ------------------------------------------------------------------
    def detect(self, images, train: bool = False):
        """Single-view backbone + plane head. images: [B, H, W, 3] normalised."""
        feats = self.backbone(images, train=train)
        outputs, query_feat = self.plane_head(feats, train=train)
        return feats, outputs, query_feat

    def __call__(self, images0, images1, train: bool = False):
        """Joint raw forward over an image pair (used for compile checks)."""
        b = images0.shape[0]
        feats, out, qf = self.detect(jnp.concatenate([images0, images1], axis=0), train)
        split = lambda t: jax.tree_util.tree_map(lambda x: x[:b], t)
        result = {"view0": split(out),
                  "view1": jax.tree_util.tree_map(lambda x: x[b:], out)}
        if self.camera_on:
            result["camera_init"] = self.camera_head.pixel_camera(feats, train)
        return result

    def bn_stats_forward(self, images0, images1):
        """Train-mode forward touching every BatchNorm layer (plane-head
        top-down decoder + camera conv trunks) so `mutable=["batch_stats"]`
        captures a batch-statistics update for each. Used by the precise-BN
        recomputation (engine/precise_bn.py) after training; returns nothing
        of interest."""
        feats, out, _ = self.detect(
            jnp.concatenate([images0, images1], axis=0), train=True)
        if self.camera_on:
            self.camera_head.pixel_camera(feats, train=True)
        return out["pred_logits"].sum()

    # ------------------------------------------------------------------
    # training
    # ------------------------------------------------------------------
    def train_forward(self, batch: Dict, rng: jax.Array):
        """Full training forward: detection + matching + 5-branch camera loss
        zoo. Spec: siamese_planeTR.py:208-299 + camera_head.py:140-344.

        TPU layout: both views run as ONE 2B batch through the shared
        backbone/head/criterion, and all pose-refinement branches run as ONE
        K*B refine call - one traced graph each instead of 2 (resp. 4),
        halving/quartering XLA compile cost and feeding the MXU bigger
        batches. Returns a dict of scalar losses (already weighted).
        """
        losses: Dict[str, jnp.ndarray] = {}
        # targets arrive in the compact wire format (data/packing.py: masks
        # bit-packed, ray map as k_inv 3x3) - restore the classic keys here,
        # on device; passthrough for hand-built unpacked dicts
        t0 = unpack_targets(batch["targets0"])
        t1 = unpack_targets(batch["targets1"])
        b = batch["image0"].shape[0]

        mw = {
            "cost_class": 1.0,
            "cost_mask": self.mask_weight,
            "cost_dice": self.dice_weight,
            "cost_center": self.center_ins_weight,
            "cost_param": self.param_hm_weight_l1,
            "cost_param_offset": self.param_weight_offset,
            "cost_param_normal_angle": self.param_weight_angle,
        }
        weight_dict = {
            "loss_ce": 1.0,
            "loss_param_l1": self.param_weight_l1,
            "loss_param_cos": self.param_weight_cos,
            "loss_q": self.param_weight_q,
            "loss_center_ins": self.center_ins_weight,
            "loss_center_pixel": 1.0,
            "loss_depth_pixel": 1.0,
            "loss_mask": self.mask_weight,
            "loss_dice": self.dice_weight,
        }

        # siamese towers share weights, so both views run as ONE 2B batch
        # (halves compile cost, doubles MXU occupancy). Known deviation from
        # the reference (siamese_planeTR.py:228-231 runs each view as its own
        # batch): trainable BatchNorm layers here normalise with statistics
        # pooled over BOTH views rather than per-view, and running stats
        # update once per step instead of twice. Eval-mode semantics (running
        # averages) are identical; the eval-mode parity harness is unaffected.
        images_cat = jnp.concatenate([batch["image0"], batch["image1"]], axis=0)
        targets_cat = jax.tree_util.tree_map(
            lambda a, c: jnp.concatenate([a, c], axis=0), t0, t1)

        feats_cat, out_cat, qf_cat = self.detect(images_cat, train=True)

        # one batched JV solve for final + all aux supervision levels
        # (match_planes_multi docstring: ~3x fewer sequential while loops)
        aux_list = list(out_cat["aux_outputs"]) if self.loss_detection_on else []
        matches = CR.match_planes_multi([out_cat] + aux_list, targets_cat, mw)
        match_cat = matches[0]
        if self.loss_detection_on:
            raw = CR.detection_losses_siamese(
                out_cat, targets_cat, match_cat, eos_coef=self.no_object_weight)
            if self.depth_on and "pixel_depth" in out_cat:
                raw["loss_depth_pixel"] = CR.depth_loss_siamese(out_cat, targets_cat)
            for k, v in raw.items():
                losses[k] = v * weight_dict[k]
            for i, (aux, match_aux) in enumerate(zip(aux_list, matches[1:])):
                raw_aux = CR.detection_losses_siamese(
                    aux, targets_cat, match_aux,
                    eos_coef=self.no_object_weight, aux=True)
                for k, v in raw_aux.items():
                    losses[f"{k}_{i}"] = v * weight_dict[k]

        match0, match1 = match_cat[:b], match_cat[b:]
        qf0, qf1 = qf_cat[:b], qf_cat[b:]

        gt_pose = batch["gt_pose"]  # [B, 7], quat already sign-canonical
        params_cat = out_cat.get("pred_params")
        params0 = params_cat[:b] if params_cat is not None else None
        params1 = params_cat[b:] if params_cat is not None else None

        gt_corr = None
        if self.embedding_on and self.matcher_on:
            gt_corr = build_pred_corr_matrix(
                match0, match1, batch["corr_idx1"], batch["corr_idx2"],
                batch["corr_valid"], self.num_queries,
            )
            if self.loss_matching_on:
                row_masks = match0 >= 0
                col_masks = match1 >= 0
                log_scores = self.matching_head(
                    qf0, qf1, gt_pose, params0, params1,
                    row_masks=row_masks, col_masks=col_masks, training=True,
                )
                gt_corr_m = intersect_with_valid(gt_corr, row_masks, col_masks)
                losses["losses_emb_0"] = matching_nll_loss(log_scores, gt_corr_m)

        if not (self.camera_on and self.loss_camera_on):
            return losses

        # ---- initial pose (PixelCameraHead) + its loss
        init = self.camera_head.pixel_camera(feats_cat, train=True)
        lt, lr = CL.camera_pose_loss(init["tran"], init["rot"], gt_pose)
        losses["loss_tran_pixelReg"] = lt * self.initial_cam_weight
        losses["loss_rot_pixelReg"] = lr * self.initial_cam_weight

        # ---- AIM auto-encoding of the initial pose (camera_head.py:227-245)
        if self.cam_rec_on:
            rec_rot, rec_rot_feat, rot_in = self.camera_head.rot_rec(init["rot"])
            losses["loss_rot_initCamRec"] = CL.rot_rec_loss(rot_in, rec_rot)
            rec_tran, rec_tran_feat, tran_in = self.camera_head.trans_rec(init["tran"])
            losses["loss_trans_initCamRec"] = CL.trans_rec_loss(tran_in, rec_tran)

        # ---- AIM with random poses (camera_head.py:325-344)
        if self.cam_rec_on and self.rand_on:
            bs = gt_pose.shape[0]
            repeat = max(self.rand_bs // bs, 1)
            r1, r2 = jax.random.split(rng)
            rand_rot = CL.rand_aim_rot(r1, bs * repeat)
            pr_rot, _, rin = self.camera_head.rot_rec(rand_rot)
            losses["loss_rot_randCamRecLBS_N1"] = CL.rot_rec_loss(rin, pr_rot)
            rand_tr = CL.rand_aim_trans(r2, bs * repeat)
            pr_tr, _, tin = self.camera_head.trans_rec(rand_tr)
            losses["loss_trans_randCamRecLBS_N1"] = CL.trans_rec_loss(tin, pr_tr)

        if not self.cam_ref_on:
            return losses

        # ---- GT-param geo sequence (camera_head.py:247-251, 1179-1333)
        geo_gt, seq_valid_gt, num_gt = build_gt_geo_sequence(
            t0["gt_params"], t1["gt_params"],
            batch["corr_idx1"], batch["corr_idx2"], batch["corr_valid"],
        )

        # assemble all refinement branches (forawrd_refineLoop called once per
        # branch in the reference, camera_head.py:259-321); here they run as
        # ONE K*B refine call with per-branch loss weights
        branches = [dict(tran=init["tran"], rot=init["rot"],
                         tf=init["tran_feat"], rf=init["rot_feat"],
                         geo=geo_gt, valid=seq_valid_gt, num=num_gt,
                         suffix="initCamRef", weight=self.plane_cam_weight)]
        if self.cam_rec_on:
            branches.append(dict(tran=rec_tran, rot=rec_rot,
                                 tf=rec_tran_feat, rf=rec_rot_feat,
                                 geo=geo_gt, valid=seq_valid_gt, num=num_gt,
                                 suffix="initRecCamRef", weight=self.plane_cam_weight))
        if gt_corr is not None and params0 is not None:
            assign = gt_corr[:, :-1, :-1].astype(self.dtype)
            geo_pred, seq_valid_pr, num_pr = build_geo_sequence(
                params0, params1, assign, self.num_queries)
            branches.append(dict(tran=init["tran"], rot=init["rot"],
                                 tf=init["tran_feat"], rf=init["rot_feat"],
                                 geo=geo_pred, valid=seq_valid_pr, num=num_pr,
                                 suffix="initCamRef_Aux",
                                 weight=self.plane_cam_weight_predplane))
            if self.cam_rec_on:
                branches.append(dict(tran=rec_tran, rot=rec_rot,
                                     tf=rec_tran_feat, rf=rec_rot_feat,
                                     geo=geo_pred, valid=seq_valid_pr, num=num_pr,
                                     suffix="initRecCamRef_Aux",
                                     weight=self.plane_cam_weight_predplane))

        cat = lambda key: jnp.concatenate([br[key] for br in branches], axis=0)
        tran_c, rot_c = cat("tran"), cat("rot")
        tf_c, rf_c = cat("tf"), cat("rf")
        geo_c, valid_c = cat("geo"), cat("valid")

        # base pose detached for the geo warp / sign trick (camera_head.py:354-368)
        dt_tran = jax.lax.stop_gradient(tran_c)
        dt_rot = jax.lax.stop_gradient(rot_c)
        geo_global = warp_geo_sequence(geo_c, dt_tran, dt_rot)
        sig_seq = compute_sig_seq(geo_c, dt_tran, dt_rot)
        ref = self.camera_head.refine(
            tf_c, rf_c, tran_c, rot_c, geo_c, valid_c, sig_seq, geo_global,
            clamp_scores=True,
        )

        for k, br in enumerate(branches):
            sl = lambda x: x[k * b:(k + 1) * b]
            ref_k = {key: sl(val) for key, val in ref.items()}
            losses.update(CL.refine_losses(
                ref_k, gt_pose, br["valid"], br["num"], br["suffix"], br["weight"]))

        return losses

    def init_all(self, batch: Dict, rng: jax.Array):
        """Parameter-creation pass touching BOTH the training and inference
        paths, so a model initialised under any loss config still has every
        submodule's parameters (flax creates params lazily on first use)."""
        losses = self.train_forward(batch, rng)
        h, w = batch["image0"].shape[1:3]
        _ = self.inference(batch["image0"], batch["image1"], out_h=int(h), out_w=int(w))
        return losses

    # ------------------------------------------------------------------
    # inference (fixed-shape device part)
    # ------------------------------------------------------------------
    def select_planes(self, outputs: Dict[str, jnp.ndarray], out_h: int, out_w: int):
        """Device half of _postprocess_planeHeadMask (siamese_planeTR.py:625-803).

        Fixed-shape: returns per-query validity instead of compacting. The
        full-resolution per-query masks are never materialised — the fused
        upsample/argmax kernel (ops/select_pallas.py) produces an argmax
        segmentation map + per-query statistics; the prob gate is folded in
        on device and the host derives per-query masks/RLE as
        (seg_gated == q) for valid q (evaluation/postprocess.py
        encode_label_map path).

        Returns dict with:
          valid [B, NQ] bool, score [B, NQ], params [B, NQ, 3],
          seg_gated [B, H, W] int8 (gated argmax label map: query id where
          the prob gate passes, -1 elsewhere — mask_q == (seg_gated == q);
          int8 because NQ <= 127, cutting the device->host fetch 5x: the
          axon tunnel moves ~38 MB/s and the old int32 seg + bool gate were
          24.8 MB per 8-pair batch = 644 ms, the measured pipeline
          bottleneck), centers [B, NQ, 2].
        """
        logits = outputs["pred_logits"]  # [B, NQ, 2]
        params = outputs["pred_params"]  # [B, NQ, 3]
        mask_logits = outputs["pred_mask_logits"]  # [B, NQ, h, w]
        b, nq, _ = logits.shape
        assert nq <= 127, "seg_gated is int8 (query ids must fit)"

        prob = jax.nn.softmax(logits, axis=-1)
        score = jnp.max(prob, axis=-1)  # [B, NQ]
        labels = jnp.argmax(prob, axis=-1)
        label_mask = (labels == 0) & (score > self.plane_score_threshold)

        # zero-detection fallback: keep the most plane-like query
        # (siamese_planeTR.py:656-661)
        any_valid = jnp.any(label_mask, axis=1, keepdims=True)  # [B, 1]
        fallback = jax.nn.one_hot(jnp.argmax(prob[..., 0], axis=1), nq, dtype=bool)
        valid = jnp.where(any_valid, label_mask, fallback)
        score = jnp.where(valid & ~label_mask, prob[..., 0], score)

        # fused: bilinear upsample to (out_h, out_w) + argmax segmentation
        # over valid queries + per-query area/centroid/threshold-count stats
        mask_prob = jax.nn.sigmoid(mask_logits)
        seg_ids, max_scaled, stats = fused_select_maps(
            mask_prob, score, valid, float(self.mask_prob_threshold),
            out_h, out_w)
        (cnt_gate, sumx_gate, sumy_gate,
         cnt_nogate, sumx_nogate, sumy_nogate, orig_cnt) = [
            stats[:, k] for k in range(7)]

        # overlap filter (siamese_planeTR.py:684-699)
        mask_area = cnt_gate * valid  # argmax winners are always valid
        original_area = orig_cnt
        overlap = mask_area / jnp.maximum(original_area, 1)
        keep = (mask_area >= 1) & (original_area >= 1) & (overlap >= self.overlap_threshold)
        keep = keep & valid

        # Three regimes, matching the reference exactly:
        #  1) normal: surviving keeps, prob-gated masks;
        #  2) zero-detection (no query above plane_score_threshold,
        #     siamese_planeTR.py:656-661,699-702): the single fallback query,
        #     overlap filter NOT applied, prob gate KEPT — and pixel (0,0)
        #     forced on when the gated mask is empty;
        #  3) all-filtered (valid queries but every overlap fails,
        #     siamese_planeTR.py:741-788): the max-overlap query with the
        #     UNGATED argmax mask. Ties broken by first index like the
        #     reference's strict `>` update rule; the argmax must land on a
        #     VALID query even when every overlap is degenerate, hence the
        #     two-level penalty (-1 valid-but-degenerate, -2 invalid).
        ov_for_max = jnp.where((mask_area >= 1) & (original_area >= 1), overlap, -1.0)
        ov_for_max = jnp.where(valid, ov_for_max, -2.0)
        fallback2 = jax.nn.one_hot(jnp.argmax(ov_for_max, axis=1), nq, dtype=bool)
        any_keep = jnp.any(keep, axis=1, keepdims=True)
        zero_case = ~any_valid  # [B, 1]: regime 2 (valid == fallback one-hot)
        final_valid = jnp.where(any_keep, keep, fallback2 & valid)
        final_valid = jnp.where(zero_case, valid, final_valid)
        gated = (any_keep | zero_case)[:, :, None]
        gate = jnp.where(gated, max_scaled > self.mask_prob_threshold, True)
        # regime 2 with an empty gated mask: reference sets pixel (0, 0)
        zero_empty = zero_case[:, 0] & (
            jnp.sum(jnp.where(valid, cnt_gate, 0.0), axis=1) < 1)
        gate = gate.at[:, 0, 0].set(gate[:, 0, 0] | zero_empty)

        # plane centers from normalised xy over the final mask
        gated_c = any_keep | zero_case
        area = jnp.where(gated_c, cnt_gate, cnt_nogate)
        cx = jnp.where(gated_c, sumx_gate, sumx_nogate) / (area + 1e-10)
        cy = jnp.where(gated_c, sumy_gate, sumy_nogate) / (area + 1e-10)
        centers = jnp.stack([cx, cy], axis=-1) * final_valid[:, :, None]

        return {
            "valid": final_valid,
            "score": score,
            "params": params,
            "seg_gated": jnp.where(gate, seg_ids, -1).astype(jnp.int8),
            "centers": centers,
        }

    def inference(self, images0, images1, out_h: int = 480, out_w: int = 640,
                  gt_geo=None, init_cam=None):
        """Full inference: detection + matching + NOPE-SAC pose.

        Spec: siamese_planeTR.py:338-450 + camera_head.py:400-640
        (inference_Joint), fixed-shape and batched.

        gt_geo: optional GT-matcher ablation (camera_head.py:520-547,
        cfg.TEST.POSE_REFINEMENT_WITH_GT_MATCHERS): a dict with
        params0/params1 [B,N,3] (GT plane params, optionally noise-perturbed
        by the caller - see engine/trainer.perturb_planes), corr_idx1/
        corr_idx2 [B,M] and corr_valid [B,M]. When given, the pose-refinement
        geo sequence is built from these GT correspondences instead of the
        predicted assignment; detection/matching outputs stay prediction-based.

        init_cam: optional initial-camera substitution (the SparsePlanes
        top-1-camera ablation, cfg.MODEL.CAMERA_HEAD.INFERENCE_SP_TOPCAM_ON;
        spec camera_head.py:419-431): a dict with tran [B,3] and rot [B,4]
        looked up on the host from the SP pickle. When given, the
        PixelCameraHead is skipped and the refinement starts from this pose
        (the reference requires CAM_REC_ON in this mode, camera_head.py:469 —
        enforced by the caller, engine/trainer.test()).
        """
        b = images0.shape[0]
        images_cat = jnp.concatenate([images0, images1], axis=0)
        feats_cat, out_cat, qf_cat = self.detect(images_cat, train=False)

        sel_cat = self.select_planes(out_cat, out_h, out_w)
        sel0 = jax.tree_util.tree_map(lambda x: x[:b], sel_cat)
        sel1 = jax.tree_util.tree_map(lambda x: x[b:], sel_cat)
        qf0, qf1 = qf_cat[:b], qf_cat[b:]

        result = {"view0": sel0, "view1": sel1}
        if self.depth_on:
            pd = out_cat.get("pixel_depth")
            if pd is not None:
                # the head emits depth at res2 resolution (H/4); the
                # reference returns full-resolution depth at inference
                # (siamese_planeTR.py:427 "# 480, 640") and the evaluator
                # subtracts it from the full-size GT map
                pd = jax.image.resize(
                    pd.astype(jnp.float32),
                    (pd.shape[0], out_h, out_w, pd.shape[-1]), "bilinear")
            result["depth0"] = pd[:b] if pd is not None else None
            result["depth1"] = pd[b:] if pd is not None else None
        if not self.camera_on:
            return result

        result.update(self.camera_inference(
            feats_cat, qf0, qf1, sel0["params"], sel1["params"],
            sel0["valid"], sel1["valid"], gt_geo=gt_geo, init_cam=init_cam))
        return result

    def camera_inference(self, feats_cat, qf0, qf1, params0, params1,
                         valid0, valid1, gt_geo=None, init_cam=None):
        """Camera half of inference: initial pose, AIM, matching, NOPE-SAC
        refinement, assignment re-gating, camera dict zoo.

        Split out of `inference` so the pipeline parity harness can inject
        backbone features / detected planes directly and exercise this exact
        glue against the reference's inference_Joint (camera_head.py:400-640).

        feats_cat: backbone features with both views concatenated on batch;
        params0/1 [B, NQ, 3] padded plane params; valid0/1 [B, NQ] bool.
        """
        b = qf0.shape[0]
        result = {}
        cameras = {}
        cameras["camera_zero"] = {
            "tran": jnp.zeros((b, 3), self.dtype),
            "rot": jnp.tile(jnp.asarray([[1.0, 0, 0, 0]], self.dtype), (b, 1)),
        }

        if init_cam is not None and not self.cam_rec_on:
            # trace-time mirror of the reference's assert (camera_head.py:469)
            raise ValueError(
                "init_cam (INFERENCE_SP_TOPCAM_ON) requires CAM_REC_ON: the "
                "substituted pose has no PixelCameraHead features, so the AIM "
                "rec heads must regenerate them")
        # initial pose (sign-canonicalised, camera_head.py:436-437)
        if init_cam is not None:
            # SP top-1-camera substitution (camera_head.py:419-431): the
            # host-provided pose replaces the PixelCameraHead prediction,
            # normalised + sign-canonicalised exactly as the reference does;
            # the regression net never runs in this graph variant. CAM_REC_ON
            # must be on (camera_head.py:469) so the AIM rec heads supply the
            # pose features downstream — asserted by the caller.
            rot = init_cam["rot"].astype(self.dtype)
            rot = rot / jnp.maximum(
                jnp.linalg.norm(rot, axis=-1, keepdims=True), 1e-12)
            init_rot = canonicalize_quat_sign(rot)
            init_tran = init_cam["tran"].astype(self.dtype)
            init = None
        else:
            init = self.camera_head.pixel_camera(feats_cat, train=False)
            init_rot = canonicalize_quat_sign(init["rot"])
            init_tran = init["tran"]
        cameras["camera_init"] = {"tran": init_tran, "rot": init_rot}

        if self.cam_rec_on:
            rec_rot, rec_rot_feat, _ = self.camera_head.rot_rec(init_rot)
            rec_tran, rec_tran_feat, _ = self.camera_head.trans_rec(init_tran)
            cameras["camera_initRec"] = {"tran": rec_tran, "rot": rec_rot}
            base_rot, base_rot_feat = rec_rot, rec_rot_feat
            base_tran, base_tran_feat = rec_tran, rec_tran_feat
        else:
            base_rot, base_rot_feat = init_rot, init["rot_feat"]
            base_tran, base_tran_feat = init_tran, init["tran_feat"]

        if not self.embedding_on:
            cameras["camera"] = cameras["camera_init"]
            result["cameras"] = cameras
            return result

        # ---- plane matching with the reconstructed pose as geometric prior
        matcher_cam = jnp.concatenate([base_tran, base_rot], axis=-1)  # [B, 7]
        log_scores = self.matching_head(
            qf0, qf1, matcher_cam, params0, params1,
            row_masks=valid0, col_masks=valid1,
        )
        assignment = mutual_max_assignment(log_scores, self.matching_score_threshold)
        result["log_scores"] = log_scores
        result["assignment_beforeRef"] = assignment

        if not self.cam_ref_on:
            cameras["camera"] = cameras["camera_init"]
            result["cameras"] = cameras
            result["assignment"] = assignment
            return result

        # ---- NOPE-SAC refinement
        if gt_geo is not None:
            geo_local, seq_valid, num_matches = build_gt_geo_sequence(
                gt_geo["params0"], gt_geo["params1"],
                gt_geo["corr_idx1"], gt_geo["corr_idx2"], gt_geo["corr_valid"])
            geo_local = geo_local.astype(self.dtype)
        else:
            geo_local, seq_valid, num_matches = build_geo_sequence(
                params0, params1, assignment, self.num_queries)
        geo_global = warp_geo_sequence(geo_local, base_tran, base_rot)
        sig_seq = compute_sig_seq(geo_local, base_tran, base_rot)

        ref = self.camera_head.refine(
            base_tran_feat, base_rot_feat, base_tran, base_rot,
            geo_local, seq_valid, sig_seq, geo_global, clamp_scores=False,
        )

        # m<=1 fallbacks (camera_head.py:964-969, 1052-1075):
        #   m == 0 -> initial pose;  m == 1 -> avg(excl) pose
        m = num_matches[:, None]
        rot_avg = jnp.where(m > 1, ref["rot_avg_incl"], ref["rot_avg_excl"])
        tran_avg = jnp.where(m > 1, ref["tran_avg_incl"], ref["tran_avg_excl"])
        rot_avg = jnp.where(m == 0, base_rot, rot_avg)
        tran_avg = jnp.where(m == 0, base_tran, tran_avg)

        if self.inference_out_cam_type == "avg-all":
            rot_f, tran_f = rot_avg, tran_avg
        elif self.inference_out_cam_type == "soft":
            rot_f, tran_f = ref["rot_soft"], ref["tran_soft"]
        elif self.inference_out_cam_type == "max-score":
            ridx = jnp.argmax(jnp.where(ref["hyp_valid"], ref["score_rot"], -jnp.inf), axis=1)
            tidx = jnp.argmax(jnp.where(ref["hyp_valid"], ref["score_trans"], -jnp.inf), axis=1)
            rot_f = jnp.take_along_axis(ref["rots_all"], ridx[:, None, None], 1)[:, 0]
            tran_f = jnp.take_along_axis(ref["trans_all"], tidx[:, None, None], 1)[:, 0]
        elif self.inference_out_cam_type == "min-cost":
            ridx = jnp.argmin(jnp.where(ref["hyp_valid"], ref["normal_l2_sum"], jnp.inf), axis=1)
            tidx = jnp.argmin(jnp.where(ref["hyp_valid"], ref["l2_dist_sum"], jnp.inf), axis=1)
            rot_f = jnp.take_along_axis(ref["rots_all"], ridx[:, None, None], 1)[:, 0]
            tran_f = jnp.take_along_axis(ref["trans_all"], tidx[:, None, None], 1)[:, 0]
        else:
            raise ValueError(self.inference_out_cam_type)

        rot_f = jnp.where(m <= 1, rot_avg, rot_f)
        tran_f = jnp.where(m <= 1, tran_avg, tran_f)
        # exact unit quaternions at inference (reference F.normalize with
        # eps=1e-12, camera_head.py:860,868): the training-path _nquat bounds
        # its normalisation gradient by returning sub-unit outputs for
        # |q| <= 1e-3, but no gradients flow here and the downstream gating /
        # quat->R / angle-error math assumes unit norm.
        rot_f = normalize(rot_f)
        rot_avg = normalize(rot_avg)
        cameras["camera_avgRef0"] = {"tran": tran_avg, "rot": rot_avg}
        cameras["camera_softRef0"] = {"tran": tran_f, "rot": rot_f}

        # sign flip for the assignment update (camera_head.py:600-601)
        flip = (rot_f[:, 0:1] < 0) if self.cam_rec_on else jnp.zeros_like(rot_f[:, 0:1], bool)
        rot_for_gate = jnp.where(flip, -rot_f, rot_f)

        # re-gate the assignment by pose consistency (camera_head.py:605-629)
        normal_dist, offset_dist = geometric_distances(params0, params1, tran_f, rot_for_gate)
        gate = (normal_dist < 45.0) & (jnp.clip(offset_dist, 1e-4, 10.0) < 1.0)
        assignment = assignment * gate.astype(assignment.dtype)
        result["assignment"] = assignment

        cameras["camera"] = {"tran": tran_f, "rot": rot_f}
        result["cameras"] = cameras
        result["camera_onePP"] = {
            "tran": ref["trans_all"], "rot": ref["rots_all"], "hyp_valid": ref["hyp_valid"],
            "score_rot": ref["score_rot"], "score_trans": ref["score_trans"],
        }
        result["num_matches"] = num_matches
        return result
