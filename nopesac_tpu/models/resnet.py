"""ResNet-50 backbone (flax, NHWC), detectron2/torchvision layout compatible.

Spec: the reference uses d2 `build_resnet_backbone` with DEPTH=50,
STRIDE_IN_1X1=False (torchvision-style: stride on the 3x3 conv),
FrozenBatchNorm, FREEZE_AT=0, OUT_FEATURES res2..res5 (configs/Base.yaml:1-12).

Weight import: parameter tree mirrors (stem, res2.0..res5.2) with conv kernels
stored HWIO; the torch->jax importer transposes OIHW -> HWIO.
"""
from __future__ import annotations

from typing import Any, Sequence

import jax.numpy as jnp
from flax import linen as nn

from .layers import FrozenBatchNorm, xavier_uniform

Dtype = Any

_STAGE_BLOCKS = {50: (3, 4, 6, 3), 101: (3, 4, 23, 3)}


class Bottleneck(nn.Module):
    """1x1 -> 3x3(stride) -> 1x1 bottleneck with FrozenBN and projection shortcut."""

    out_channels: int
    bottleneck_channels: int
    stride: int = 1
    has_shortcut: bool = False
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        out = nn.Conv(self.bottleneck_channels, (1, 1), use_bias=False, dtype=self.dtype,
                      kernel_init=xavier_uniform, name="conv1")(x)
        out = FrozenBatchNorm(self.bottleneck_channels, dtype=self.dtype, name="bn1")(out)
        out = nn.relu(out)
        out = nn.Conv(self.bottleneck_channels, (3, 3), strides=(self.stride, self.stride),
                      padding=[(1, 1), (1, 1)], use_bias=False, dtype=self.dtype,
                      kernel_init=xavier_uniform, name="conv2")(out)
        out = FrozenBatchNorm(self.bottleneck_channels, dtype=self.dtype, name="bn2")(out)
        out = nn.relu(out)
        out = nn.Conv(self.out_channels, (1, 1), use_bias=False, dtype=self.dtype,
                      kernel_init=xavier_uniform, name="conv3")(out)
        out = FrozenBatchNorm(self.out_channels, dtype=self.dtype, name="bn3")(out)

        if self.has_shortcut:
            sc = nn.Conv(self.out_channels, (1, 1), strides=(self.stride, self.stride),
                         use_bias=False, dtype=self.dtype, kernel_init=xavier_uniform,
                         name="shortcut_conv")(x)
            sc = FrozenBatchNorm(self.out_channels, dtype=self.dtype, name="shortcut_bn")(sc)
        else:
            sc = x
        return nn.relu(out + sc)


class ResNet(nn.Module):
    """ResNet backbone returning {res2, res3, res4, res5} NHWC feature maps."""

    depth: int = 50
    stem_out_channels: int = 64
    out_features: Sequence[str] = ("res2", "res3", "res4", "res5")
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        # stem: 7x7/2 conv + frozen BN + relu + 3x3/2 maxpool
        x = nn.Conv(self.stem_out_channels, (7, 7), strides=(2, 2), padding=[(3, 3), (3, 3)],
                    use_bias=False, dtype=self.dtype, kernel_init=xavier_uniform,
                    name="stem_conv1")(x)
        x = FrozenBatchNorm(self.stem_out_channels, dtype=self.dtype, name="stem_bn1")(x)
        x = nn.relu(x)
        x = nn.max_pool(x, (3, 3), strides=(2, 2), padding=[(1, 1), (1, 1)])

        feats = {}
        channels = 256
        bottleneck = 64
        for stage_idx, num_blocks in enumerate(_STAGE_BLOCKS[self.depth]):
            name = f"res{stage_idx + 2}"
            for block_idx in range(num_blocks):
                stride = 2 if (block_idx == 0 and stage_idx > 0) else 1
                x = Bottleneck(
                    out_channels=channels,
                    bottleneck_channels=bottleneck,
                    stride=stride,
                    has_shortcut=(block_idx == 0),
                    dtype=self.dtype,
                    name=f"{name}_{block_idx}",
                )(x)
            if name in self.out_features:
                feats[name] = x
            channels *= 2
            bottleneck *= 2
        return feats
