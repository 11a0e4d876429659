"""ResNet-50 backbone (flax, NHWC), detectron2/torchvision layout compatible.

Spec: the reference uses d2 `build_resnet_backbone` with DEPTH=50,
STRIDE_IN_1X1=False (torchvision-style: stride on the 3x3 conv),
FrozenBatchNorm, FREEZE_AT=0, OUT_FEATURES res2..res5 (configs/Base.yaml:1-12).

Weight import: parameter tree mirrors (stem, res2.0..res5.2) with conv kernels
stored HWIO; the torch->jax importer transposes OIHW -> HWIO.
"""
from __future__ import annotations

from typing import Any, Optional, Sequence

import jax
import jax.numpy as jnp
from jax import lax
from flax import linen as nn

from .layers import FrozenBatchNorm, xavier_uniform

Dtype = Any

_STAGE_BLOCKS = {50: (3, 4, 6, 3), 101: (3, 4, 23, 3)}


class _StemConv(nn.Module):
    """The stem 7x7/2 conv, stored as a [7,7,3,C] HWIO kernel (same param
    tree as nn.Conv, so torch weight import is unchanged), with an optional
    width-parity space-to-depth form: an exact rewrite as a 7x4/(2,1) conv
    on [B, H, W/2, 2c] input (free row-major reshape).
    out[j] = sum_dx W[dx] X[2j+dx-3] == sum_{b,px} W8[2b+px] X[2(j+b-2)+px]
    with W8 = W zero-padded to 8 w-taps in front.

    s2d defaults OFF: in isolation it is faster (1.46ms vs 2.07ms at bs=16
    on v5e; full 2x2 s2d is faster still for the conv alone) but embedded
    in the model XLA's layout assignment inserts relayout copies that cost
    more than the conv saves (+1.4ms end to end, measured both variants).
    Kept for future layout-pass changes; exactness is unit-tested.
    """

    features: int = 64
    dtype: Dtype = jnp.float32
    s2d: bool = False

    @nn.compact
    def __call__(self, x):
        kernel = self.param("kernel", xavier_uniform, (7, 7, 3, self.features),
                            jnp.float32)
        kernel = kernel.astype(self.dtype)
        x = x.astype(self.dtype)
        if not self.s2d:
            return lax.conv_general_dilated(
                x, kernel, window_strides=(2, 2), padding=[(3, 3), (3, 3)],
                dimension_numbers=("NHWC", "HWIO", "NHWC"))
        b, h, w, c = x.shape
        # input: fold w-parity into channels -> [B, H, W/2, 2c] (no copy)
        x2 = x.reshape(b, h, w // 2, 2 * c)
        # kernel: pad 7->8 w-taps at the FRONT, group (px, c) like the input
        k8 = jnp.pad(kernel, ((0, 0), (1, 0), (0, 0), (0, 0)))
        k2 = k8.reshape(7, 4, 2 * c, self.features)
        return lax.conv_general_dilated(
            x2, k2, window_strides=(2, 1), padding=[(3, 3), (2, 1)],
            dimension_numbers=("NHWC", "HWIO", "NHWC"))


class _ConvKernel(nn.Module):
    """Bare conv kernel parameter, tree-compatible with nn.Conv (no bias)."""

    shape: Sequence[int]

    @nn.compact
    def __call__(self):
        return self.param("kernel", xavier_uniform, tuple(self.shape),
                          jnp.float32)


class _BNParams(nn.Module):
    """FrozenBatchNorm parameters, tree-compatible with FrozenBatchNorm.
    Returns the folded per-channel (mul, add) in f32."""

    features: int
    eps: float = 1e-5

    @nn.compact
    def __call__(self):
        scale = self.param("scale", nn.initializers.ones, (self.features,), jnp.float32)
        bias = self.param("bias", nn.initializers.zeros, (self.features,), jnp.float32)
        mean = self.param("mean", nn.initializers.zeros, (self.features,), jnp.float32)
        var = self.param("var", nn.initializers.ones, (self.features,), jnp.float32)
        mul = scale * jax.lax.rsqrt(var + self.eps)
        return mul, bias - mean * mul


class Bottleneck(nn.Module):
    """1x1 -> 3x3(stride) -> 1x1 bottleneck with FrozenBN and projection
    shortcut.

    fuse_tail=True runs the identity-block tails (conv1+BN+relu and
    conv3+BN3+residual+ReLU) as pallas matmul kernels
    (ops/bottleneck_pallas.py) at inference. It defaults OFF: although XLA
    leaves the residual add+relu as a separate full-map HBM pass (3.4ms/step
    at bs=16, v5e), forcing row-major pallas boundaries inside the stage
    makes XLA insert relayout copies around its {3,0,2,1}-layout convs that
    cost far more than the fusion saves (28.5ms vs 21.5ms full-model,
    measured). Kept (exactness unit-tested) for a future whole-stage fused
    kernel where boundaries are rare. The training path always uses plain
    XLA ops (differentiable)."""

    out_channels: int
    bottleneck_channels: int
    stride: int = 1
    has_shortcut: bool = False
    # interior compute dtype (conv/BN/relu chain inside the block)
    dtype: Dtype = jnp.float32
    # residual-trunk dtype: the dtype x arrives in and the block returns.
    # None means "= dtype" (the homogeneous-precision layout). Setting
    # out_dtype=f32 with dtype=bf16 gives the AMP-style mixed policy: block
    # interiors run 1-pass bf16 on the MXU with half the HBM traffic, while
    # the residual stream — where the DETR query-distinguishing signal
    # accumulates (see ResNet.__call__ note) — stays f32.
    out_dtype: Optional[Dtype] = None
    fuse_tail: bool = False

    @nn.compact
    def __call__(self, x, train: bool = False):
        odt = self.dtype if self.out_dtype is None else self.out_dtype
        cin = x.shape[-1]
        k1 = _ConvKernel((1, 1, cin, self.bottleneck_channels), name="conv1")()
        m1, a1 = _BNParams(self.bottleneck_channels, name="bn1")()
        k3 = _ConvKernel((1, 1, self.bottleneck_channels, self.out_channels),
                         name="conv3")()
        m3, a3 = _BNParams(self.out_channels, name="bn3")()

        from ..utils.backend import pallas_ok

        fused = (self.fuse_tail and not train and not self.has_shortcut
                 and pallas_ok())

        if fused:
            from ..ops.bottleneck_pallas import conv1x1_bn_add_relu
            b, h, w, _ = x.shape
            xp = x.reshape(b, h * w, cin)
            out = conv1x1_bn_add_relu(
                xp, k1.reshape(cin, self.bottleneck_channels), m1, a1,
                residual=None, relu=True)
            out = out.reshape(b, h, w, self.bottleneck_channels)
        else:
            out = lax.conv_general_dilated(
                x.astype(self.dtype), k1.astype(self.dtype), (1, 1),
                [(0, 0), (0, 0)],
                dimension_numbers=("NHWC", "HWIO", "NHWC"))
            out = out * m1.astype(self.dtype) + a1.astype(self.dtype)
            out = nn.relu(out)

        out = nn.Conv(self.bottleneck_channels, (3, 3), strides=(self.stride, self.stride),
                      padding=[(1, 1), (1, 1)], use_bias=False, dtype=self.dtype,
                      kernel_init=xavier_uniform, name="conv2")(out)
        out = FrozenBatchNorm(self.bottleneck_channels, dtype=self.dtype, name="bn2")(out)
        out = nn.relu(out)

        if fused:
            from ..ops.bottleneck_pallas import conv1x1_bn_add_relu
            b, h, w, _ = out.shape
            op = out.reshape(b, h * w, self.bottleneck_channels)
            rp = x.reshape(b, h * w, self.out_channels)
            y = conv1x1_bn_add_relu(
                op, k3.reshape(self.bottleneck_channels, self.out_channels),
                m3, a3, residual=rp, relu=True)
            return y.reshape(b, h, w, self.out_channels)

        out = lax.conv_general_dilated(
            out, k3.astype(self.dtype), (1, 1), [(0, 0), (0, 0)],
            dimension_numbers=("NHWC", "HWIO", "NHWC"))
        # the BN3 affine + residual add + relu run in the trunk dtype so the
        # block's contribution is accumulated at full trunk precision
        out = out.astype(odt) * m3.astype(odt) + a3.astype(odt)

        if self.has_shortcut:
            sc = nn.Conv(self.out_channels, (1, 1), strides=(self.stride, self.stride),
                         use_bias=False, dtype=self.dtype, kernel_init=xavier_uniform,
                         name="shortcut_conv")(x.astype(self.dtype))
            sc = FrozenBatchNorm(self.out_channels, dtype=odt,
                                 name="shortcut_bn")(sc.astype(odt))
        else:
            sc = x.astype(odt)
        return nn.relu(out + sc)


class ResNet(nn.Module):
    """ResNet backbone returning {res2, res3, res4, res5} NHWC feature maps."""

    depth: int = 50
    stem_out_channels: int = 64
    out_features: Sequence[str] = ("res2", "res3", "res4", "res5")
    dtype: Dtype = jnp.float32
    stem_s2d: bool = False
    fuse_tail: bool = False
    # Rematerialise bottleneck blocks in train mode: the backbone's
    # early-stage activations dominate train-step HBM (bs=16 f32 res2
    # intermediates are 300-600 MB EACH and the 64-channel maps pad 2x on
    # the (8,128) tile — the exact OOM dump of BENCH_r03). Per-block remat
    # stores only block boundaries and re-runs each block's forward once in
    # the backward pass. remat_stages can limit the recompute to a subset,
    # but measured bs=16 on a v5e chip the FULL set wins on wall clock too:
    # res2+res3-only remat saves ~4% step FLOPs yet runs ~2% SLOWER
    # (344.2 vs 338.9 ms/step bf16, 351.5 vs 344.8 f32) — the scheduler
    # spends the freed HBM on fewer spills/copies than the recompute costs.
    remat: bool = True
    remat_stages: Sequence[str] = ("res2", "res3", "res4", "res5")
    # TRAIN-mode block-interior compute dtype. The residual TRUNK always
    # stays f32 in train mode: measured on the synthetic overfit (800 steps,
    # bs=8), with a fully-bf16 backbone the DETR plane head never escapes the
    # uniform-logits saddle (CE frozen at ln 2, dice 0.73) even after the
    # whole transformer stack, FPN and mask einsum were already forced f32 —
    # the Hungarian-assignment dynamics need the backbone features (and their
    # gradients) resolved below bf16's 2^-8 relative rounding. But "f32"
    # storage and bf16 MXU operands are separable: f32 convs at
    # Precision.DEFAULT already round operands to bf16 on TPU (1-pass,
    # f32-accumulate — tools/bench_conv_precision.py), so setting
    # train_block_dtype=bf16 only changes where intermediate activations are
    # ROUNDED to bf16 (block interiors), while every residual accumulation
    # stays f32 (MODEL.BACKBONE_TRAIN_DTYPE; 800-step overfit convergence
    # A/B in PERF.md "Backbone-mixed-precision A/B", round 5).
    # Inference keeps the homogeneous bf16 rate (367 pairs/s/chip,
    # full-pipeline parity validated).
    train_block_dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        dt = jnp.float32 if train else self.dtype
        bdt = self.train_block_dtype if train else self.dtype
        # stem: 7x7/2 conv (space-to-depth form) + frozen BN + relu + maxpool
        x = _StemConv(self.stem_out_channels, dtype=bdt,
                      s2d=self.stem_s2d, name="stem_conv1")(x)
        x = FrozenBatchNorm(self.stem_out_channels, dtype=bdt, name="stem_bn1")(x)
        x = nn.relu(x)
        x = nn.max_pool(x, (3, 3), strides=(2, 2), padding=[(1, 1), (1, 1)])
        x = x.astype(dt)  # trunk dtype from here on

        feats = {}
        channels = 256
        bottleneck = 64
        # nn.remat is a transparent lifted transform: the param tree keeps
        # the plain `res{s}_{b}/...` paths, so torch import / checkpoints /
        # eval-mode graphs are unaffected. argnums: 0=self, 1=x, 2=train.
        remat_block = nn.remat(Bottleneck, static_argnums=(2,))
        for stage_idx, num_blocks in enumerate(_STAGE_BLOCKS[self.depth]):
            name = f"res{stage_idx + 2}"
            block_cls = (remat_block
                         if (train and self.remat and name in self.remat_stages)
                         else Bottleneck)
            for block_idx in range(num_blocks):
                stride = 2 if (block_idx == 0 and stage_idx > 0) else 1
                x = block_cls(
                    out_channels=channels,
                    bottleneck_channels=bottleneck,
                    stride=stride,
                    has_shortcut=(block_idx == 0),
                    dtype=bdt,
                    out_dtype=dt,
                    fuse_tail=self.fuse_tail,
                    name=f"{name}_{block_idx}",
                )(x, train)  # positional: remat static_argnums=(2,)
            if name in self.out_features:
                feats[name] = x
            channels *= 2
            bottleneck *= 2
        return feats
