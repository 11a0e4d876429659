"""Transformer primitives: DETR encoder/decoder + LoFTR-style GNN (flax).

Specs:
  * DETR layers: modeling/transformer/transformer.py (pos embeddings added to
    q/k only, post-norm encoder, pre-norm decoder with intermediate returns).
  * GNN: modeling/transformer/gnn.py (LoFTR LocalFeatureTransformer:
    bias-free projections, FFN on [x, message] concat, masked full attention).

Everything is batched [B, L, C]; attention is a single fused einsum chain
that XLA maps onto the MXU. Sequence lengths here are tiny (300 tokens,
50 queries) so attention is compute-bound on projections, not memory.
"""
from __future__ import annotations

from typing import Any, Optional

import jax.numpy as jnp
from flax import linen as nn

from .layers import xavier_uniform

Dtype = Any


class MultiHeadAttention(nn.Module):
    """Standard MHA with separate q/k/v inputs; mirrors torch.nn.MultiheadAttention."""

    d_model: int
    nhead: int
    dropout: float = 0.1
    use_bias: bool = True
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, q, k, v, key_mask: Optional[jnp.ndarray] = None, deterministic: bool = True):
        dh = self.d_model // self.nhead
        b, lq, _ = q.shape
        lk = k.shape[1]

        def proj(x, name):
            x = nn.Dense(self.d_model, use_bias=self.use_bias, dtype=self.dtype,
                         kernel_init=xavier_uniform, name=name)(x)
            return x.reshape(b, -1, self.nhead, dh)

        qh = proj(q, "q_proj")
        kh = proj(k, "k_proj")
        vh = proj(v, "v_proj")

        logits = jnp.einsum("blhd,bshd->bhls", qh, kh) / jnp.sqrt(dh).astype(self.dtype)
        if key_mask is not None:
            # key_mask: [B, S] True = keep
            logits = jnp.where(key_mask[:, None, None, :], logits, jnp.asarray(-1e9, self.dtype))
        attn = nn.softmax(logits, axis=-1)
        if key_mask is not None:
            # hard re-zero: cuts the softmax-VJP backward path through masked
            # keys (fused VJP NaNs under XLA for fully-masked rows)
            attn = jnp.where(key_mask[:, None, None, :], attn, jnp.asarray(0.0, self.dtype))
        attn = nn.Dropout(self.dropout)(attn, deterministic=deterministic)
        out = jnp.einsum("bhls,bshd->blhd", attn, vh).reshape(b, lq, self.d_model)
        return nn.Dense(self.d_model, use_bias=self.use_bias, dtype=self.dtype,
                        kernel_init=xavier_uniform, name="out_proj")(out)


def _scan_unroll() -> int:
    """Trace-time unroll factor for the layer scans.

    On TPU, unrolling lets XLA software-pipeline the small per-layer
    matmuls ([B,300,256]-sized) across layers instead of paying the
    while-loop barrier per layer; parameters stay stacked along axis 0, so
    checkpoints are identical. On CPU (tests) unroll=1 keeps single-core
    compile time low. Override with NOPESAC_SCAN_UNROLL.
    """
    import os

    import jax

    v = os.environ.get("NOPESAC_SCAN_UNROLL")
    if v:
        return int(v)
    from ..utils.backend import on_axon_tunnel, on_tpu

    if on_axon_tunnel():
        # unroll>1 + Mosaic custom calls makes the tunnel's remote compile
        # never return (bisected: either alone compiles in ~157s, the
        # combination exceeds 540s) - cap to 1 there, keep 6 on direct TPU
        return 1
    return 6 if on_tpu() else 1


class EncoderLayer(nn.Module):
    """Post-norm DETR encoder layer (transformer.py:155-199, normalize_before=False)."""

    d_model: int
    nhead: int
    dim_feedforward: int = 1024
    dropout: float = 0.1
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, src, pos, deterministic: bool = True):
        qk = src + pos
        attn = MultiHeadAttention(self.d_model, self.nhead, self.dropout, dtype=self.dtype,
                                  name="self_attn")(qk, qk, src, deterministic=deterministic)
        src = src + nn.Dropout(self.dropout)(attn, deterministic=deterministic)
        src = nn.LayerNorm(dtype=self.dtype, name="norm1")(src)
        ff = nn.Dense(self.dim_feedforward, dtype=self.dtype, kernel_init=xavier_uniform,
                      name="linear1")(src)
        ff = nn.Dropout(self.dropout)(nn.relu(ff), deterministic=deterministic)
        ff = nn.Dense(self.d_model, dtype=self.dtype, kernel_init=xavier_uniform,
                      name="linear2")(ff)
        src = src + nn.Dropout(self.dropout)(ff, deterministic=deterministic)
        return nn.LayerNorm(dtype=self.dtype, name="norm2")(src)


class _EncoderScanBlock(nn.Module):
    """One encoder layer in (carry, _) scan form."""

    d_model: int
    nhead: int
    dim_feedforward: int
    dropout: float
    deterministic: bool
    dtype: Dtype

    @nn.compact
    def __call__(self, carry, _):
        src, pos = carry
        src = EncoderLayer(self.d_model, self.nhead, self.dim_feedforward, self.dropout,
                           dtype=self.dtype, name="layer")(src, pos, self.deterministic)
        return (src, pos), None


class Encoder(nn.Module):
    """Stack of post-norm encoder layers + final LayerNorm (planeTR_head.py:79-82).

    TPU note: layers are identical in structure, so they are lax.scan-ed with
    stacked parameters - XLA compiles ONE layer body instead of num_layers
    copies (compile time drops ~6x; runtime unchanged)."""

    d_model: int
    nhead: int
    num_layers: int
    dim_feedforward: int = 1024
    dropout: float = 0.1
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, src, pos, deterministic: bool = True):
        scan = nn.scan(
            _EncoderScanBlock,
            variable_axes={"params": 0},
            split_rngs={"params": True, "dropout": True},
            length=self.num_layers,
            unroll=_scan_unroll(),
        )
        (src, _), _ = scan(self.d_model, self.nhead, self.dim_feedforward, self.dropout,
                           deterministic, self.dtype, name="layers")((src, pos), None)
        return nn.LayerNorm(dtype=self.dtype, name="norm")(src)


class DecoderLayer(nn.Module):
    """Pre-norm DETR decoder layer (transformer.py:293-322, normalize_before=True)."""

    d_model: int
    nhead: int
    dim_feedforward: int = 1024
    dropout: float = 0.1
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, tgt, memory, pos, query_pos, deterministic: bool = True):
        t2 = nn.LayerNorm(dtype=self.dtype, name="norm1")(tgt)
        qk = t2 + query_pos
        sa = MultiHeadAttention(self.d_model, self.nhead, self.dropout, dtype=self.dtype,
                                name="self_attn")(qk, qk, t2, deterministic=deterministic)
        tgt = tgt + nn.Dropout(self.dropout)(sa, deterministic=deterministic)
        t2 = nn.LayerNorm(dtype=self.dtype, name="norm2")(tgt)
        ca = MultiHeadAttention(self.d_model, self.nhead, self.dropout, dtype=self.dtype,
                                name="cross_attn")(t2 + query_pos, memory + pos, memory,
                                                   deterministic=deterministic)
        tgt = tgt + nn.Dropout(self.dropout)(ca, deterministic=deterministic)
        t2 = nn.LayerNorm(dtype=self.dtype, name="norm3")(tgt)
        ff = nn.Dense(self.dim_feedforward, dtype=self.dtype, kernel_init=xavier_uniform,
                      name="linear1")(t2)
        ff = nn.Dropout(self.dropout)(nn.relu(ff), deterministic=deterministic)
        ff = nn.Dense(self.d_model, dtype=self.dtype, kernel_init=xavier_uniform,
                      name="linear2")(ff)
        return tgt + nn.Dropout(self.dropout)(ff, deterministic=deterministic)


class _DecoderScanBlock(nn.Module):
    d_model: int
    nhead: int
    dim_feedforward: int
    dropout: float
    deterministic: bool
    dtype: Dtype

    @nn.compact
    def __call__(self, carry, _):
        tgt, memory, pos, query_pos = carry
        tgt = DecoderLayer(self.d_model, self.nhead, self.dim_feedforward, self.dropout,
                           dtype=self.dtype, name="layer")(tgt, memory, pos, query_pos,
                                                           self.deterministic)
        return (tgt, memory, pos, query_pos), tgt


class Decoder(nn.Module):
    """Pre-norm decoder returning per-layer normed intermediates
    [num_layers, B, Q, C] (transformer.py:106-152, return_intermediate=True).

    Layers are scanned with stacked params (single compiled body); the shared
    final LayerNorm is applied to the stacked raw intermediates, which equals
    the reference's per-layer norm(output) collection."""

    d_model: int
    nhead: int
    num_layers: int
    dim_feedforward: int = 1024
    dropout: float = 0.1
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, tgt, memory, pos, query_pos, deterministic: bool = True):
        scan = nn.scan(
            _DecoderScanBlock,
            variable_axes={"params": 0},
            split_rngs={"params": True, "dropout": True},
            length=self.num_layers,
            unroll=_scan_unroll(),
        )
        _, inters = scan(self.d_model, self.nhead, self.dim_feedforward, self.dropout,
                         deterministic, self.dtype, name="layers")(
            (tgt, memory, pos, query_pos), None)
        return nn.LayerNorm(dtype=self.dtype, name="norm")(inters)


class GNNLayer(nn.Module):
    """LoFTR encoder layer: masked full attention + FFN on [x, message]
    (gnn.py:46-96). All projections bias-free."""

    d_model: int
    nhead: int
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x, source, x_mask=None, source_mask=None):
        b, l, c = x.shape
        dh = self.d_model // self.nhead

        def proj(v, name):
            v = nn.Dense(self.d_model, use_bias=False, dtype=self.dtype,
                         kernel_init=xavier_uniform, name=name)(v)
            return v.reshape(b, -1, self.nhead, dh)

        q = proj(x, "q_proj")
        k = proj(source, "k_proj")
        v = proj(source, "v_proj")

        logits = jnp.einsum("blhd,bshd->blsh", q, k) / jnp.sqrt(dh).astype(q.dtype)
        keep = None
        if x_mask is not None and source_mask is not None:
            keep = x_mask[:, :, None, None] & source_mask[:, None, :, None]
            logits = jnp.where(keep, logits, jnp.asarray(-1e9, logits.dtype))
        attn = nn.softmax(logits, axis=2)
        if keep is not None:
            # Re-zero masked weights AFTER the softmax. Numerically the
            # softmax already assigns them ~0, but this hard where() (a) cuts
            # the backward path through fully-masked rows, whose fused
            # softmax-VJP otherwise NaNs under XLA (observed on CPU with >=2
            # scanned layers), and (b) makes masked rows exactly zero instead
            # of uniform garbage that would feed the next layer.
            attn = jnp.where(keep, attn, jnp.asarray(0.0, attn.dtype))
        msg = jnp.einsum("blsh,bshd->blhd", attn, v).reshape(b, l, self.d_model)
        msg = nn.Dense(self.d_model, use_bias=False, dtype=self.dtype,
                       kernel_init=xavier_uniform, name="merge")(msg)
        msg = nn.LayerNorm(dtype=self.dtype, name="norm1")(msg)

        msg = jnp.concatenate([x, msg], axis=-1)
        msg = nn.Dense(2 * self.d_model, use_bias=False, dtype=self.dtype,
                       kernel_init=xavier_uniform, name="mlp1")(msg)
        msg = nn.relu(msg)
        msg = nn.Dense(self.d_model, use_bias=False, dtype=self.dtype,
                       kernel_init=xavier_uniform, name="mlp2")(msg)
        msg = nn.LayerNorm(dtype=self.dtype, name="norm2")(msg)
        return x + msg


class _GNNPairBlock(nn.Module):
    """One (self, cross) GNN pair in scan form. Within a pair the SAME self
    layer processes both views and the SAME cross layer runs both directions
    sequentially (feat1's cross sees the UPDATED feat0), matching
    gnn.py:128-137 exactly."""

    d_model: int
    nhead: int
    dtype: Dtype

    @nn.compact
    def __call__(self, carry, _):
        feat0, feat1, mask0, mask1 = carry
        self_layer = GNNLayer(self.d_model, self.nhead, dtype=self.dtype, name="self_layer")
        feat0 = self_layer(feat0, feat0, mask0, mask0)
        feat1 = self_layer(feat1, feat1, mask1, mask1)
        cross_layer = GNNLayer(self.d_model, self.nhead, dtype=self.dtype, name="cross_layer")
        feat0 = cross_layer(feat0, feat1, mask0, mask1)
        feat1 = cross_layer(feat1, feat0, mask1, mask0)
        return (feat0, feat1, mask0, mask1), None


class LocalFeatureGNN(nn.Module):
    """Alternating self/cross attention over two plane sets (gnn.py:98-137),
    scanned over the 9 pairs with stacked params (one compiled body)."""

    d_model: int = 256
    nhead: int = 8
    num_pairs: int = 9
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, feat0, feat1, mask0=None, mask1=None):
        b, l0, _ = feat0.shape
        l1 = feat1.shape[1]
        # scan carries must be concrete arrays; None masks become all-valid
        # (identical numerics - the mask fill is then a no-op)
        if mask0 is None:
            mask0 = jnp.ones((b, l0), bool)
        if mask1 is None:
            mask1 = jnp.ones((b, l1), bool)
        scan = nn.scan(
            _GNNPairBlock,
            variable_axes={"params": 0},
            split_rngs={"params": True},
            length=self.num_pairs,
            unroll=_scan_unroll(),
        )
        (feat0, feat1, _, _), _ = scan(self.d_model, self.nhead, self.dtype, name="pairs")(
            (feat0, feat1, mask0, mask1), None)
        return feat0, feat1
