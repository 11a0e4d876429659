"""Plane matching head: attentional GNN + geometry-aware masked Sinkhorn OT.

Spec: modeling/matching_net/matching_head.py:24-139.
  * appearance projection (1x1), 9x(self,cross) LoFTR GNN, descriptor proj
  * affinity = <d1, d2>/sqrt(256) - offset_dist/OFFSET_MULT - normal_dist/NORMAL_MULT
    where the geometric distances come from warping view-0 plane params by the
    input camera (stop-gradient, matching_head.py:74-99)
  * masked log-domain Sinkhorn with learnable dustbin, 200 iterations

Returns the padded [B, N+1, N+1] log-score matrix. The reference's
CUDA-hardcoded mask construction (matching_head.py:52-62) is replaced by
dense boolean masks.
"""
from __future__ import annotations

from typing import Any, Optional

import jax
import jax.numpy as jnp
from flax import linen as nn

from ..core.geometry import normalize, warp_planes_identity, warp_planes_to_global
from ..core.sinkhorn import log_optimal_transport_masked
from .layers import xavier_uniform
from .transformer import LocalFeatureGNN

Dtype = Any


def geometric_distances(params1, params2, cam_tran, cam_quat):
    """Pairwise normal-angle (deg) and offset distances between warped planes.

    params1/params2: [B, N, 3]; cam_tran: [B, 3]; cam_quat: [B, 4].
    Spec: matching_head.py:74-99 (also reused at camera_head.py:605-626).
    """
    p2_w = warp_planes_identity(params2)  # [B, N2, 3]
    offset2 = jnp.linalg.norm(p2_w, axis=-1, keepdims=True)  # [B, N2, 1]
    normal2 = normalize(p2_w)

    # rotation-only warp for the normal distance
    p1_r = warp_planes_to_global(params1, cam_quat, jnp.zeros_like(cam_tran))
    normal1_r = normalize(p1_r)
    ntn_r = jnp.einsum("bnc,bmc->bnm", normal1_r, normal2)
    normal_dist = jnp.rad2deg(jnp.arccos(jnp.clip(ntn_r, -1.0, 1.0)))

    # full warp for the offset distance
    p1_rt = warp_planes_to_global(params1, cam_quat, cam_tran)
    offset1 = jnp.linalg.norm(p1_rt, axis=-1, keepdims=True)  # [B, N1, 1]
    normal1_rt = normalize(p1_rt)
    ntn_rt = jnp.einsum("bnc,bmc->bnm", normal1_rt, normal2)
    diff = jnp.abs(offset1 - jnp.swapaxes(offset2, 1, 2))
    summ = jnp.abs(offset1 + jnp.swapaxes(offset2, 1, 2))
    offset_dist = jnp.where(ntn_rt < 0, summ, diff)
    offset_dist = jnp.clip(offset_dist, 1e-10, 5.0)
    return normal_dist, offset_dist


class MatchingHead(nn.Module):
    offset_multiplier: float = 4.0
    normal_multiplier: float = 8.0
    sinkhorn_iterations: int = 200
    d_model: int = 256
    gnn_pairs: int = 9
    dtype: Dtype = jnp.float32
    # Opt-in: the VMEM-resident Pallas kernel (ops/sinkhorn_pallas.py) is
    # numerically identical but Mosaic compilation is pathologically slow on
    # remote-compile backends (axon tunnel: ~70s for a trivial kernel), so
    # the scan-lowered lax implementation is the default everywhere.
    use_pallas_sinkhorn: Optional[bool] = False

    @nn.compact
    def __call__(
        self,
        plane_app1: jnp.ndarray,  # [B, N1, 256]
        plane_app2: jnp.ndarray,  # [B, N2, 256]
        matcher_input_cam: Optional[jnp.ndarray],  # [B, 7] = (tran, quat) or None
        params1: Optional[jnp.ndarray],  # [B, N1, 3]
        params2: Optional[jnp.ndarray],  # [B, N2, 3]
        row_masks: Optional[jnp.ndarray] = None,  # [B, N1] bool
        col_masks: Optional[jnp.ndarray] = None,  # [B, N2] bool
        normal_decay: float = 1.0,
        offset_decay: float = 1.0,
        training: bool = False,
    ):
        b, n1, _ = plane_app1.shape
        n2 = plane_app2.shape[1]

        if matcher_input_cam is None:
            offset_dist = jnp.zeros((b, n1, n2), self.dtype)
            normal_dist = jnp.zeros((b, n1, n2), self.dtype)
        else:
            normal_dist, offset_dist = geometric_distances(
                params1, params2, matcher_input_cam[:, :3], matcher_input_cam[:, 3:]
            )
        # the geometric prior is a fixed bias, never a gradient path
        # (matching_head.py:98-99; note the reference swaps the decay names)
        offset_dist = jax.lax.stop_gradient(offset_dist) * normal_decay
        normal_dist = jax.lax.stop_gradient(normal_dist) * offset_decay

        app_proj = nn.Dense(self.d_model, dtype=self.dtype, kernel_init=xavier_uniform,
                            name="plane_app_proj")
        plane_app1 = app_proj(plane_app1)
        plane_app2 = app_proj(plane_app2)

        desc1, desc2 = LocalFeatureGNN(self.d_model, 8, self.gnn_pairs, dtype=self.dtype,
                                       name="gnn")(plane_app1, plane_app2, row_masks, col_masks)
        desc_proj = nn.Dense(self.d_model, dtype=self.dtype, kernel_init=xavier_uniform,
                             name="plane_desc_proj")
        desc1 = desc_proj(desc1)
        desc2 = desc_proj(desc2)

        log_scores = jnp.einsum("bnd,bmd->bnm", desc1, desc2) / (self.d_model ** 0.5)
        log_scores = log_scores - offset_dist / self.offset_multiplier
        log_scores = log_scores - normal_dist / self.normal_multiplier

        bin_score = self.param("bin_score", nn.initializers.ones, (), jnp.float32)
        use_pallas = self.use_pallas_sinkhorn
        if use_pallas is None:
            from ..utils.backend import pallas_ok
            use_pallas = pallas_ok()
        if training:
            # Pallas kernels carry no VJP; the train loss differentiates
            # through the (scan-lowered, AD-capable) lax implementation.
            use_pallas = False
        if use_pallas:
            from ..ops.sinkhorn_pallas import log_optimal_transport_masked_pallas

            log_scores_padded = log_optimal_transport_masked_pallas(
                log_scores.astype(jnp.float32), bin_score, self.sinkhorn_iterations,
                row_masks=row_masks, col_masks=col_masks,
            ).astype(self.dtype)
        else:
            log_scores_padded = log_optimal_transport_masked(
                log_scores, bin_score.astype(self.dtype), self.sinkhorn_iterations,
                row_masks=row_masks, col_masks=col_masks,
            )
        return log_scores_padded
