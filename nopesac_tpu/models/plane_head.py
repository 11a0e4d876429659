"""PlaneTR detection head: DETR-style plane detector (flax, NHWC).

Spec: modeling/planeTR_net/planeTR_head.py:24-252.
  * sine pos-emb on res5 tokens (15x20 = 300 tokens)
  * 1x1 input projection 2048 -> 256
  * 6-layer post-norm encoder, 50 learned queries, 6-layer pre-norm decoder
    (keeps the last 3 intermediate states for deep supervision)
  * `top_down` FPN pixel decoder (laterals res2..res5 + encoder memory inject)
  * mask logits = einsum(plane_embedding, pixel_embedding)
  * plane/no-plane classifier, plane-param MLP, plane-center MLP + pixel maps

The whole head is one jittable function of the backbone feature dict; mask
einsum `lbqc,bhwc->lbqhw` maps straight onto the MXU.
"""
from __future__ import annotations

from typing import Any, Dict

import jax.numpy as jnp
from flax import linen as nn

from .layers import MLP, ConvBN, sine_position_embedding, upsample_bilinear, xavier_uniform
from .transformer import Decoder, Encoder

Dtype = Any


class TopDown(nn.Module):
    """FPN-ish pixel decoder with encoder-memory injection (planeTR_head.py:218-252)."""

    channel: int = 256
    m_dim: int = 256
    dtype: Dtype = jnp.float32
    axis_name: str | None = None

    @nn.compact
    def __call__(self, c1, c2, c3, c4, memory, train: bool = False):
        cbr = lambda name: ConvBN(self.channel, kernel_size=1, dtype=self.dtype,
                                  axis_name=self.axis_name, name=name)
        p4 = cbr("c4_conv")(c4, train) + cbr("m4_conv")(memory, train)
        up = lambda x: upsample_bilinear(x, x.shape[1] * 2, x.shape[2] * 2)
        p3 = cbr("up_conv3")(up(p4), train) + cbr("c3_conv")(c3, train)
        p2 = cbr("up_conv2")(up(p3), train) + cbr("c2_conv")(c2, train)
        p1 = cbr("up_conv1")(up(p2), train) + cbr("c1_conv")(c1, train)
        return p1


class PlaneTRHead(nn.Module):
    """Plane detection head producing class/mask/param/center predictions."""

    num_queries: int = 50
    hidden_dim: int = 256
    nheads: int = 8
    enc_layers: int = 6
    dec_layers: int = 6
    num_classes: int = 1
    mask_dim: int = 256
    channel: int = 256
    param_on: bool = True
    center_on: bool = True
    depth_on: bool = False
    num_aux: int = 3  # decoder intermediates kept (hs[-3:], planeTR_head.py:140)
    dropout: float = 0.1  # transformer dropout (reference transformer.py default)
    dtype: Dtype = jnp.float32
    # TRAIN-mode dtype of the FPN / pixel path (MODEL.FPN_TRAIN_DTYPE). The
    # round-3 bisection that pinned px_dtype to f32 ran against a fully-bf16
    # backbone; with the round-5 backbone policy (bf16 interiors, f32 trunk)
    # the pixel side's rounding is spatial — not query-distinguishing — so
    # this knob re-tests it independently. Convergence A/B: PERF.md round 5.
    fpn_train_dtype: Dtype = jnp.float32
    axis_name: str | None = None

    @nn.compact
    def __call__(self, features: Dict[str, jnp.ndarray], train: bool = False):
        c1, c2, c3, c4 = (features["res2"], features["res3"], features["res4"], features["res5"])
        b, hc, wc, _ = c4.shape

        # The whole transformer stack (encoder + decoder + output heads) runs
        # in f32 even under bf16 compute: it is ~3% of model FLOPs (300+50
        # tokens vs the 480x640 conv/mask paths) yet carries the query
        # specialisation dynamics that bf16 rounding measurably kills (see
        # the decoder note below). The backbone, FPN and mask einsum — the
        # actual FLOPs — stay in compute dtype.
        head_dtype = jnp.float32
        # Pixel/FPN path: f32 in TRAIN mode only. The Hungarian-assignment
        # stability that drives DETR query specialisation needs the mask /
        # center costs resolved below bf16's 2^-8 relative rounding; with a
        # bf16 FPN the whole model plateaus at uniform logits (CE = ln 2,
        # query-feature spread ~5e-4 after 1600 steps — measured, see
        # git history for the three-step bisection; that bisection predates
        # the mixed-precision backbone and is re-tested via fpn_train_dtype
        # above). At inference there are no assignment dynamics, so the
        # conv-heavy path keeps the bf16 MXU rate (validated: full-pipeline
        # parity + 367 pairs/s/chip).
        px_dtype = self.fpn_train_dtype if train else self.dtype
        pos = sine_position_embedding(hc, wc, self.hidden_dim // 2, dtype=head_dtype)
        pos = jnp.broadcast_to(pos[None], (b, hc * wc, self.hidden_dim))

        src = nn.Conv(self.hidden_dim, (1, 1), dtype=head_dtype, kernel_init=xavier_uniform,
                      name="input_proj")(c4)
        src = src.reshape(b, hc * wc, self.hidden_dim)

        memory = Encoder(self.hidden_dim, self.nheads, self.enc_layers, dim_feedforward=1024,
                         dropout=self.dropout, dtype=head_dtype,
                         name="context_sa")(src, pos, deterministic=not train)

        # Decoder in f32: the 50-query residual stream sits at O(1) per dim
        # while the query-distinguishing signal is O(1e-3) — below the bf16
        # ulp (2^-8), so under bf16 all queries round to the SAME
        # representation and training never escapes the uniform-logits saddle
        # (measured: post-train query-feature spread 0.0035 = exactly the
        # bf16 ulp, CE frozen at ln 2).
        query_embed = self.param("query_embed", nn.initializers.normal(1.0),
                                 (self.num_queries, self.hidden_dim), jnp.float32)
        query_pos = jnp.broadcast_to(query_embed[None].astype(head_dtype),
                                     (b, self.num_queries, self.hidden_dim))
        tgt = jnp.zeros_like(query_pos)
        hs = Decoder(self.hidden_dim, self.nheads, self.dec_layers, dim_feedforward=1024,
                     dropout=self.dropout, dtype=head_dtype,
                     name="decoder")(tgt, memory, pos, query_pos,
                                     deterministic=not train)
        hs = hs[-self.num_aux:]  # [L, B, Q, C]
        if not train:
            # deep-supervision aux outputs feed only the training criterion;
            # at inference compute the output heads for the last layer only
            # (saves 2/3 of the [L,B,Q,H,W] mask einsum + its HBM traffic)
            hs = hs[-1:]

        memory_map = memory.reshape(b, hc, wc, self.hidden_dim)
        p_context = TopDown(self.channel, self.hidden_dim, dtype=px_dtype,
                            axis_name=self.axis_name, name="top_down")(
            c1, c2, c3, c4, memory_map, train)

        plane_emb = MLP(self.hidden_dim, self.mask_dim, 3, dtype=head_dtype,
                        name="plane_embedding")(hs)  # [L, B, Q, C]
        pixel_emb = nn.Conv(self.mask_dim, (1, 1), dtype=px_dtype, kernel_init=xavier_uniform,
                            name="pixel_embedding")(p_context)  # [B, H, W, C]
        # Mask einsum fully in f32 (~3 GFLOP of the ~5 TFLOP step): casting
        # plane_emb to bf16 here rounds away the O(1e-3) per-query embedding
        # differences, so every query produces the SAME mask, the Hungarian
        # matcher's assignment is arbitrary, and the per-query gradients
        # average out — measured as query-feature collapse (std-across-
        # queries 5e-4 after 1600 bf16 steps) with CE frozen at ln 2 even
        # with the whole transformer stack already in f32.
        mask_logits = jnp.einsum("lbqc,bhwc->lbqhw",
                                 plane_emb, pixel_emb.astype(jnp.float32),
                                 preferred_element_type=jnp.float32)

        plane_logits = nn.Dense(self.num_classes + 1, dtype=head_dtype,
                                kernel_init=xavier_uniform, name="plane_prob")(hs)

        out = {
            "pred_logits": plane_logits[-1],
            "pred_mask_logits": mask_logits[-1],
        }
        n_aux = plane_logits.shape[0] - 1  # 0 at inference (last layer only)
        aux = [{"pred_logits": plane_logits[i], "pred_mask_logits": mask_logits[i]}
               for i in range(n_aux)]

        if self.param_on:
            plane_param = MLP(self.hidden_dim, 3, 3, dtype=head_dtype, name="plane_param")(hs)
            out["pred_params"] = plane_param[-1]
            for i, a in enumerate(aux):
                a["pred_params"] = plane_param[i]
        if self.center_on:
            plane_center = nn.sigmoid(
                MLP(self.hidden_dim, 2, 3, dtype=head_dtype, name="plane_center")(hs))
            pixel_center = nn.sigmoid(
                nn.Conv(2, (1, 1), dtype=px_dtype, kernel_init=xavier_uniform,
                        name="pixel_plane_center")(p_context))  # [B, H, W, 2]
            out["pred_centers"] = plane_center[-1]
            out["pixel_centers"] = pixel_center
            for i, a in enumerate(aux):
                a["pred_centers"] = plane_center[i]
        if self.depth_on:
            p_depth = TopDown(self.channel, self.hidden_dim, dtype=px_dtype,
                              axis_name=self.axis_name, name="top_down_depth")(
                c1, c2, c3, c4, memory_map, train)
            out["pixel_depth"] = nn.Conv(1, (1, 1), dtype=px_dtype,
                                         kernel_init=xavier_uniform, name="depth")(p_depth)

        out["aux_outputs"] = aux
        return out, hs[-1]
