"""NOPE-SAC camera head: initial pose regression + arbitrary-initialization
auto-encoders + one-plane pose hypothesis refinement with soft fusion.

Spec: modeling/camera_net/camera_head.py:35-1465. Key TPU redesign points:
  * All per-batch Python loops (score softmax camera_head.py:813-815,
    matching-mask build :776-781, geo-sequence builders :1179-1425) become
    masked fixed-shape tensor ops over [B, NQ(+1), ...] with a `num_matches`
    vector; the whole head jits into one fused launch.
  * Hypothesis scoring warps [B, NQ+1, NQ, 3] plane tensors in one vmapped
    kernel instead of looping over hypotheses.
  * The m==0 / m==1 inference fallbacks (camera_head.py:964-969,1052-1075)
    become jnp.where selects.
"""
from __future__ import annotations

from typing import Any, Dict, Optional, Sequence

import jax
import jax.numpy as jnp
from flax import linen as nn

from ..core.assignment import assignment_to_sequence
from ..core.geometry import (
    canonicalize_quat_sign,
    normalize,
    safe_norm,
    warp_planes_identity,
    warp_planes_to_global,
)
from .layers import MLP, ConvBN, ConvGN, max_pool_2x2, upsample_nearest, xavier_uniform

Dtype = Any


def _torch_linear_init(fan_in: int):
    """torch nn.Linear default init: U(-1/sqrt(fan_in), 1/sqrt(fan_in)),
    applied to both kernel and bias (the reference's trans/rots regressors
    are plain nn.Linear, camera_head.py:64-65)."""
    bound = 1.0 / (fan_in ** 0.5)

    def init(key, shape, dtype=jnp.float32):
        return jax.random.uniform(key, shape, dtype, -bound, bound)

    return init


def _nquat(q: jnp.ndarray) -> jnp.ndarray:
    """Quaternion normalisation for regressor outputs: exactly unit whenever
    |q| > 1e-3, with the normalisation gradient bounded at ~1e3.

    Raw Dense outputs sit near zero at init (zero bias + relu-dead features),
    and the torch-default eps=1e-12 let O(1e12) gradients through `rots`
    overflow the f32 global grad norm (observed 1e23). |q| <= 1e-3 outputs
    are degenerate under either convention."""
    return normalize(q, eps=1e-3)


# ---------------------------------------------------------------------------
# geo sequence construction (pure functions)
# ---------------------------------------------------------------------------

def build_geo_sequence(params1, params2, assignment, max_matches: int):
    """Assignment matrix -> padded matched plane-pair sequence.

    params1: [B, N1, 3]; params2: [B, N2, 3]; assignment: [B, N1, N2] 0/1.
    Returns (geo_seq [B, M, 6], valid [B, M] bool, num [B] int32), with
    pairs in row-major order of the assignment (camera_head.py:1352-1425).
    """

    def single(p1, p2, a):
        idx1, idx2, valid, num = assignment_to_sequence(a, max_matches)
        m1 = jnp.take(p1, idx1, axis=0) * valid[:, None]
        m2 = jnp.take(p2, idx2, axis=0) * valid[:, None]
        return jnp.concatenate([m1, m2], axis=-1), valid, num

    return jax.vmap(single)(params1, params2, assignment)


def build_gt_geo_sequence(gt_planes1, gt_planes2, corr_idx1, corr_idx2, corr_valid):
    """GT corrs -> padded matched plane-pair sequence (camera_head.py:1179-1333).

    gt_planes1/2: [B, N, 3] zero-padded GT plane params;
    corr_idx1/2: [B, M] int32 (0 where invalid); corr_valid: [B, M] bool.
    """
    m1 = jnp.take_along_axis(gt_planes1, corr_idx1[..., None], axis=1)
    m2 = jnp.take_along_axis(gt_planes2, corr_idx2[..., None], axis=1)
    v = corr_valid[..., None].astype(gt_planes1.dtype)
    geo = jnp.concatenate([m1 * v, m2 * v], axis=-1)
    return geo, corr_valid, jnp.sum(corr_valid.astype(jnp.int32), axis=-1)


def warp_geo_sequence(geo_local, tran, quat):
    """Local matched-pair sequence -> global frame (camera_head.py:1335-1350).

    geo_local: [B, M, 6]; tran: [B, 3]; quat: [B, 4]. Zero padding is
    preserved (warp(0) == 0).
    """
    p1 = warp_planes_to_global(geo_local[..., :3], quat, tran)
    p2 = warp_planes_identity(geo_local[..., 3:])
    return jnp.concatenate([p1, p2], axis=-1)


def compute_sig_seq(geo_local, tran, quat):
    """Sign-sequence trick (camera_head.py:367-368): compare the x component of
    the view-0 plane warped with and without translation."""
    with_t = warp_planes_to_global(geo_local[..., :3], quat, tran)
    without_t = warp_planes_to_global(geo_local[..., :3], quat, jnp.zeros_like(tran))
    sig = (with_t[..., 0:1] * without_t[..., 0:1]) >= 0
    return (sig.astype(geo_local.dtype) - 0.5) * 2.0


# ---------------------------------------------------------------------------
# modules
# ---------------------------------------------------------------------------

class BasePixelDecoder(nn.Module):
    """MaskFormer FPN decoder over res3..res5 (drops res2), GN norm.

    Spec: camera_modules.py:246-353. Output at res3 resolution, mask_dim chans.
    """

    conv_dim: int = 256
    mask_dim: int = 256
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, features: Dict[str, jnp.ndarray]):
        res3, res4, res5 = features["res3"], features["res4"], features["res5"]
        y = ConvGN(self.conv_dim, 3, dtype=self.dtype, name="layer_res5")(res5)
        for name, feat in (("res4", res4), ("res3", res3)):
            lat = ConvGN(self.conv_dim, 1, use_activation=False, dtype=self.dtype,
                         name=f"adapter_{name}")(feat)
            y = lat + upsample_nearest(y, 2)
            y = ConvGN(self.conv_dim, 3, dtype=self.dtype, name=f"layer_{name}")(y)
        return nn.Conv(self.mask_dim, (3, 3), padding=[(1, 1), (1, 1)], dtype=self.dtype,
                       kernel_init=xavier_uniform, name="mask_features")(y)


class ConvStack(nn.Module):
    """conv2d(+BN+LeakyReLU) stack with optional stride-2 downsamples.

    Spec: camera_modules.py:36-48 (BN eps=1e-3, momentum=0.01) used in
    camera_head.py:78-112.
    """

    features: Sequence[int]
    strides: Sequence[int]
    pool_after: Sequence[int] = ()
    dtype: Dtype = jnp.float32
    axis_name: Optional[str] = None

    @nn.compact
    def __call__(self, x, train: bool = False):
        leaky = lambda v: nn.leaky_relu(v, negative_slope=0.01)
        for i, (f, s) in enumerate(zip(self.features, self.strides)):
            x = ConvBN(f, kernel_size=3, strides=s, activation=leaky, bn_eps=1e-3,
                       bn_momentum=0.99, dtype=self.dtype, axis_name=self.axis_name,
                       name=f"conv{i}")(x, train)
            if i in self.pool_after:
                x = max_pool_2x2(x)
        return x


def compute_corr_softmax(f1, f2):
    """4D correlation volume with softmax over view-2 positions.

    f1/f2: [B, H, W, C] NHWC -> [B, H1, W1, W2*H2] with channel index
    s = x2 * H2 + y2 (the reference transposes view-2 before flattening,
    camera_head.py:1117-1133).
    """
    b, h2, w2, c = f2.shape
    f2_vec = jnp.swapaxes(f2, 1, 2).reshape(b, w2 * h2, c)  # [B, W2*H2, C]
    corr = jnp.einsum("bsc,bhwc->bhws", f2_vec, f1)
    return jax.nn.softmax(corr, axis=-1)


class PlaneCameraHead(nn.Module):
    """Full NOPE-SAC camera head (PixelCameraHead + AIM + PlaneCamRefHead)."""

    num_queries: int = 50
    cam_rec_on: bool = True
    cam_ref_on: bool = True
    warp_plane_in_cam_ref_on: bool = True
    dtype: Dtype = jnp.float32
    axis_name: Optional[str] = None

    def setup(self):
        self.pixel_decoder = BasePixelDecoder(dtype=self.dtype)
        self.convs_backbone = ConvStack(
            features=(256,) * 6, strides=(1,) * 6, pool_after=(1, 3),
            dtype=self.dtype, axis_name=self.axis_name, name="convs_backbone")
        down = dict(features=(128,) * 6, strides=(1, 2, 1, 2, 1, 2), dtype=self.dtype,
                    axis_name=self.axis_name)
        self.convs_trans = ConvStack(**down, name="convs_trans")
        self.convs_rots = ConvStack(**down, name="convs_rots")
        self.fc_trans = nn.Dense(256, dtype=self.dtype, kernel_init=xavier_uniform)
        self.fc_rots = nn.Dense(256, dtype=self.dtype, kernel_init=xavier_uniform)
        # shared pose regressors (camera_head.py:64-65). These are plain
        # nn.Linear in the reference, i.e. torch-default U(+-1/sqrt(fan_in))
        # for BOTH kernel and bias: the nonzero bias keeps the raw quat away
        # from zero at init, which bounds the normalisation gradient in
        # camera_pose_loss (a zero-bias init produced the iter-0 grad-norm
        # spike; see losses/camera_losses.py).
        tl = _torch_linear_init(256)
        self.trans = nn.Dense(3, dtype=self.dtype, kernel_init=tl, bias_init=tl)
        self.rots = nn.Dense(4, dtype=self.dtype, kernel_init=tl, bias_init=tl)

        if self.cam_rec_on:
            self.rot_emb_proj = MLP(256, 256, 6, dtype=self.dtype)
            self.trans_emb_proj = MLP(256, 256, 6, dtype=self.dtype)

        if self.cam_ref_on:
            self.geo_encoder = MLP(1024, 1024, 6, dtype=self.dtype)
            self.geo_proj_s1 = MLP(1024, 1024, 3, dtype=self.dtype)
            self.decoder_rot = MLP(512, 256, 6, dtype=self.dtype)
            self.geo_proj_s2 = MLP(1024, 1024, 3, dtype=self.dtype)
            self.decoder_tran = MLP(512, 256, 6, dtype=self.dtype)
            self.decoder_rot2 = MLP(512, 256, 3, dtype=self.dtype)
            self.decoder_tran2 = MLP(512, 256, 3, dtype=self.dtype)
            self.normal_score_proj = MLP(128, 64, 3, dtype=self.dtype)
            self.rot_score_reg = nn.Dense(1, dtype=self.dtype, kernel_init=xavier_uniform)
            self.param_score_proj = MLP(128, 64, 3, dtype=self.dtype)
            self.trans_score_reg = nn.Dense(1, dtype=self.dtype, kernel_init=xavier_uniform)

    # -- Pose Regression Network (initial pose) ---------------------------
    def pixel_camera(self, features_cat, train: bool = False):
        """Initial pose from the 4D correlation volume (camera_head.py:642-683).

        features_cat: feature dict with BOTH views concatenated along batch
        (view0 = first half) - the siamese towers share weights, so one pass
        at 2B halves the compile cost and doubles MXU occupancy.
        """
        x = self.convs_backbone(self.pixel_decoder(features_cat), train)
        b = x.shape[0] // 2
        x1, x2 = x[:b], x[b:]
        aff = compute_corr_softmax(x1, x2)

        tf = self.convs_trans(aff, train)
        tf = tf.reshape(tf.shape[0], -1)
        trans_feat = nn.relu(self.fc_trans(tf))

        rf = self.convs_rots(aff, train)
        rf = rf.reshape(rf.shape[0], -1)
        rots_feat = nn.relu(self.fc_rots(rf))

        trans = self.trans(trans_feat)
        rot = _nquat(self.rots(rots_feat))
        return {"tran": trans, "rot": rot, "tran_feat": trans_feat, "rot_feat": rots_feat}

    # -- Arbitrary Initialization Module (pose auto-encoders) -------------
    def rot_rec(self, input_rot):
        """Rotation auto-encoder (camera_head.py:685-711). Input is detached and
        sign-canonicalised; returns (pred_rot, rot_feat, canonical_input)."""
        input_rot = jax.lax.stop_gradient(canonicalize_quat_sign(input_rot))
        rot_feat = nn.relu(self.rot_emb_proj(input_rot))
        pred_rot = _nquat(self.rots(rot_feat))
        return pred_rot, rot_feat, input_rot

    def trans_rec(self, input_trans):
        """Translation auto-encoder (camera_head.py:713-735)."""
        input_trans = jax.lax.stop_gradient(input_trans) + 1e-10
        trans_feat = nn.relu(self.trans_emb_proj(input_trans))
        pred_trans = self.trans(trans_feat)
        return pred_trans, trans_feat, input_trans

    # -- NOPE-SAC refinement ----------------------------------------------
    def refine(
        self,
        initial_trans_feat,  # [B, 256]
        initial_rot_feat,  # [B, 256]
        initial_trans,  # [B, 3]
        initial_rot,  # [B, 4]
        geo_local,  # [B, M, 6] matched plane pairs, zero padded
        seq_valid,  # [B, M] bool
        sig_seq,  # [B, M, 1] +-1
        geo_global,  # [B, M, 6] = warp_geo_sequence(geo_local, init pose)
        clamp_scores: bool,  # True at train (camera_head.py:816,846)
    ):
        """One-plane pose hypotheses + scoring + soft/avg fusion.

        Spec: camera_head.py:737-923 (train) / :925-1115 (inference); both
        paths share this function, differing only in score clamping and the
        final selection (done by the caller).
        """
        dt = self.dtype
        b, max_n, _ = geo_local.shape
        seq_f = seq_valid.astype(dt)

        # hypothesis h=0 is the initial pose; h=i+1 comes from match i
        hyp_valid = jnp.concatenate([jnp.ones((b, 1), bool), seq_valid], axis=1)  # [B, M+1]
        matching_mask = (hyp_valid[:, :, None] & seq_valid[:, None, :]).astype(dt)  # [B, M+1, M]
        mask_col0 = matching_mask[:, :, 0:1]  # [B, M+1, 1]

        # ---- geo encoding (camera_head.py:744-772)
        geo_src = geo_global if self.warp_plane_in_cam_ref_on else geo_local
        g0, g1 = geo_src[..., :3], geo_src[..., 3:]
        off0 = safe_norm(g0, axis=-1, keepdims=True)
        nrm0 = g0 / (off0 + 1e-10)
        off1 = safe_norm(g1, axis=-1, keepdims=True)
        nrm1 = g1 / (off1 + 1e-10)
        if self.warp_plane_in_cam_ref_on:
            off0 = off0 * sig_seq
            nrm0 = nrm0 * sig_seq
        geo_in = jnp.concatenate([nrm0, off0, nrm1, off1], axis=-1)  # [B, M, 8]
        geo_fea = self.geo_encoder(geo_in)
        geo_s1 = self.geo_proj_s1(geo_fea)
        geo_rot = self.decoder_rot(geo_s1)  # [B, M, 256]
        geo_s2 = self.geo_proj_s2(jnp.concatenate([geo_s1, geo_rot], axis=-1))
        geo_tran = self.decoder_tran(geo_s2)  # [B, M, 256]

        # ---- per-match pose hypotheses (camera_head.py:783-794,822-823)
        init_rf = jnp.broadcast_to(initial_rot_feat[:, None, :], (b, max_n, 256))
        init_tf = jnp.broadcast_to(initial_trans_feat[:, None, :], (b, max_n, 256))
        fused_rot_feat = nn.relu(self.decoder_rot2(jnp.concatenate([init_rf, geo_rot], -1)))
        fused_tran_feat = nn.relu(self.decoder_tran2(jnp.concatenate([init_tf, geo_tran], -1)))

        rots_all = _nquat(self.rots(fused_rot_feat))  # [B, M, 4]
        rots_all = jnp.concatenate([initial_rot[:, None, :], rots_all], axis=1)  # [B, M+1, 4]
        trans_all = self.trans(fused_tran_feat)  # [B, M, 3]
        trans_all = jnp.concatenate([initial_trans[:, None, :], trans_all], axis=1)

        # ---- consistency distances over [B, M+1, M, 3] warped planes
        warp_h = jax.vmap(warp_planes_to_global, in_axes=(None, 1, 1), out_axes=1)
        plane1_mid = warp_planes_identity(geo_local[..., 3:])[:, None, :, :]  # [B, 1, M, 3]
        zeros_t = jnp.zeros((b, max_n + 1, 3), dt)
        plane0_r = warp_h(geo_local[..., :3], rots_all, zeros_t)  # [B, M+1, M, 3]
        n0_r = normalize(plane0_r)
        n1_r = normalize(plane1_mid)
        normal_angle = jnp.rad2deg(jnp.arccos(jnp.clip(jnp.sum(n0_r * n1_r, -1), -1.0, 1.0)))
        normal_l2 = safe_norm(n0_r - n1_r, axis=-1) * matching_mask
        score_normal = jnp.exp(-normal_l2) * matching_mask  # [B, M+1, M]

        rot_score_logit = self.rot_score_reg(self.normal_score_proj(score_normal))  # [B, M+1, 1]

        plane0_rt = warp_h(geo_local[..., :3], rots_all, trans_all)  # [B, M+1, M, 3]
        off0_rt = safe_norm(plane0_rt, axis=-1)
        off1_rt = safe_norm(plane1_mid, axis=-1)
        n0_rt = normalize(plane0_rt)
        ntn = jnp.sum(n0_rt * n1_r, axis=-1)
        offset_dist = jnp.where(ntn < 0, jnp.abs(off0_rt + off1_rt), jnp.abs(off0_rt - off1_rt))
        l2_dist = safe_norm(plane0_rt - plane1_mid, axis=-1)  # [B, M+1, M]
        l2_masked = jnp.exp(-l2_dist * matching_mask) * matching_mask
        trans_score_logit = self.trans_score_reg(self.param_score_proj(l2_masked))

        # ---- masked softmax over valid hypotheses (axis 1)
        def masked_softmax(logit):
            logit = jnp.where(hyp_valid[:, :, None], logit, -jnp.inf)
            s = jax.nn.softmax(logit, axis=1)
            if clamp_scores:
                s = jnp.clip(s, 0.01, 0.9)
            s = s * mask_col0
            return s / (jnp.sum(s, axis=1, keepdims=True) + 1e-10) if clamp_scores else s

        score_rot = masked_softmax(rot_score_logit)  # [B, M+1, 1]
        score_trans = masked_softmax(trans_score_logit)

        # ---- fusion (camera_head.py:850-869 / :1045-1066)
        score_avg = mask_col0 / (jnp.sum(mask_col0, axis=1, keepdims=True) + 1e-10)

        def fuse(feats_all, init_feat, score, include_initial):
            # feats_all: [B, M, 256]; score: [B, M+1, 1]
            if include_initial:
                stacked = jnp.concatenate([init_feat[:, None, :], feats_all], axis=1)
                return jnp.sum(stacked * score, axis=1)
            s = score[:, 1:]
            s = s / (jnp.sum(s, axis=1, keepdims=True) + 1e-10)
            return jnp.sum(feats_all * s, axis=1)

        # avg pose: training always uses the hypotheses-only form
        # (camera_head.py:856-859); inference switches on m>1 (:1052-1063)
        fused_tran_avg_excl = fuse(fused_tran_feat, initial_trans_feat, score_avg, False)
        fused_rot_avg_excl = fuse(fused_rot_feat, initial_rot_feat, score_avg, False)
        fused_tran_avg_incl = fuse(fused_tran_feat, initial_trans_feat, score_avg, True)
        fused_rot_avg_incl = fuse(fused_rot_feat, initial_rot_feat, score_avg, True)

        fused_tran_soft = fuse(fused_tran_feat, initial_trans_feat, score_trans, True)
        fused_rot_soft = fuse(fused_rot_feat, initial_rot_feat, score_rot, True)

        out = {
            "trans_all": trans_all,  # [B, M+1, 3]
            "rots_all": rots_all,  # [B, M+1, 4]
            "score_rot": score_rot[..., 0],  # [B, M+1]
            "score_trans": score_trans[..., 0],
            "hyp_valid": hyp_valid,
            "l2_dist": l2_dist,
            "normal_angle": normal_angle,
            "offset_dist": offset_dist,
            "normal_l2_sum": jnp.sum(normal_l2, axis=-1),  # [B, M+1]
            "l2_dist_sum": jnp.sum(l2_dist * matching_mask, axis=-1),
            "tran_soft": self.trans(fused_tran_soft),
            "rot_soft": _nquat(self.rots(fused_rot_soft)),
            "tran_avg_excl": self.trans(fused_tran_avg_excl),
            "rot_avg_excl": _nquat(self.rots(fused_rot_avg_excl)),
            "tran_avg_incl": self.trans(fused_tran_avg_incl),
            "rot_avg_incl": _nquat(self.rots(fused_rot_avg_incl)),
        }
        return out
