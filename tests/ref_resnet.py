"""Clean-room torch ResNet-50 following detectron2's documented conventions.

The reference pins its backbone at `configs/Base.yaml:4-12`:
`build_resnet_backbone`, DEPTH=50, STEM_OUT_CHANNELS=64, STRIDE_IN_1X1=False
(torchvision convention: the stride sits on the 3x3 conv), norm=FrozenBN
(d2 RESNETS.NORM default), OUT_FEATURES res2..res5, and loads torchvision
ImageNet weights (`detectron2://ImageNetPretrained/torchvision/R-50.pkl`).

detectron2 is not installed in this environment, so this module re-creates
that architecture from its public specification — the d2 ResNet paper
layout plus d2's state_dict naming contract (`stem.conv1.weight`,
`stem.conv1.norm.*`, `res{2..5}.{i}.conv{1,2,3}[.norm].*`,
`res{N}.0.shortcut[.norm].*`) — so `utils/torch_import.py` and
`models/resnet.py` can be validated against an executable torch twin.
Written from the architecture description only; no d2 code was consulted.
"""
from __future__ import annotations

import torch
import torch.nn.functional as F
from torch import nn


class FrozenBatchNorm2d(nn.Module):
    """BN with all statistics and affine params frozen as buffers.

    Matches d2's FrozenBatchNorm2d numerics: the folded form
    ``x * scale + (bias - mean * scale)`` with ``scale = weight *
    rsqrt(var + eps)``, eps = 1e-5.
    """

    def __init__(self, num_features: int, eps: float = 1e-5):
        super().__init__()
        self.eps = eps
        self.register_buffer("weight", torch.ones(num_features))
        self.register_buffer("bias", torch.zeros(num_features))
        self.register_buffer("running_mean", torch.zeros(num_features))
        self.register_buffer("running_var", torch.ones(num_features))

    def forward(self, x):
        scale = self.weight * (self.running_var + self.eps).rsqrt()
        bias = self.bias - self.running_mean * scale
        return x * scale.reshape(1, -1, 1, 1) + bias.reshape(1, -1, 1, 1)


class ConvNorm(nn.Conv2d):
    """Conv2d carrying its norm as a `.norm` child (d2's Conv2d contract,
    which is what puts `conv1.norm.weight` etc. in the state_dict)."""

    def __init__(self, *args, norm: nn.Module, **kwargs):
        super().__init__(*args, bias=False, **kwargs)
        self.norm = norm

    def forward(self, x):
        return self.norm(super().forward(x))


class BasicStem(nn.Module):
    """7x7/2 conv + FrozenBN + relu + 3x3/2 maxpool."""

    def __init__(self, in_channels: int = 3, out_channels: int = 64):
        super().__init__()
        self.conv1 = ConvNorm(in_channels, out_channels, 7, stride=2,
                              padding=3, norm=FrozenBatchNorm2d(out_channels))

    def forward(self, x):
        x = F.relu_(self.conv1(x))
        return F.max_pool2d(x, kernel_size=3, stride=2, padding=1)


class BottleneckBlock(nn.Module):
    """1x1 -> 3x3 -> 1x1 bottleneck, STRIDE_IN_1X1=False: the stage stride
    lives on the 3x3 conv2 (torchvision convention, Base.yaml:11)."""

    def __init__(self, in_channels: int, out_channels: int,
                 bottleneck_channels: int, stride: int = 1):
        super().__init__()
        self.conv1 = ConvNorm(in_channels, bottleneck_channels, 1,
                              norm=FrozenBatchNorm2d(bottleneck_channels))
        self.conv2 = ConvNorm(bottleneck_channels, bottleneck_channels, 3,
                              stride=stride, padding=1,
                              norm=FrozenBatchNorm2d(bottleneck_channels))
        self.conv3 = ConvNorm(bottleneck_channels, out_channels, 1,
                              norm=FrozenBatchNorm2d(out_channels))
        if in_channels != out_channels:
            self.shortcut = ConvNorm(in_channels, out_channels, 1,
                                     stride=stride,
                                     norm=FrozenBatchNorm2d(out_channels))
        else:
            self.shortcut = None

    def forward(self, x):
        out = F.relu_(self.conv1(x))
        out = F.relu_(self.conv2(out))
        out = self.conv3(out)
        shortcut = self.shortcut(x) if self.shortcut is not None else x
        return F.relu_(out + shortcut)


class ResNet50(nn.Module):
    """d2-layout ResNet-50 returning {res2..res5} NCHW feature maps."""

    STAGE_BLOCKS = (3, 4, 6, 3)

    def __init__(self, stem_out_channels: int = 64,
                 out_features=("res2", "res3", "res4", "res5")):
        super().__init__()
        self.stem = BasicStem(3, stem_out_channels)
        self.out_features = tuple(out_features)
        self.stage_names = []
        in_channels, out_channels, bottleneck = stem_out_channels, 256, 64
        for stage_idx, num_blocks in enumerate(self.STAGE_BLOCKS):
            name = f"res{stage_idx + 2}"
            blocks = []
            for block_idx in range(num_blocks):
                stride = 2 if (block_idx == 0 and stage_idx > 0) else 1
                blocks.append(BottleneckBlock(
                    in_channels if block_idx == 0 else out_channels,
                    out_channels, bottleneck, stride=stride))
            self.add_module(name, nn.Sequential(*blocks))
            self.stage_names.append(name)
            in_channels, out_channels, bottleneck = (
                out_channels, out_channels * 2, bottleneck * 2)

    def forward(self, x):
        x = self.stem(x)
        feats = {}
        for name in self.stage_names:
            x = getattr(self, name)(x)
            if name in self.out_features:
                feats[name] = x
        return feats


def randomize_(model: ResNet50, seed: int = 0) -> None:
    """Give every conv kernel and BN buffer a non-trivial random value so
    parity checks cannot pass by cancellation (e.g. identity BN)."""
    gen = torch.Generator().manual_seed(seed)
    with torch.no_grad():
        for _, mod in model.named_modules():
            if isinstance(mod, nn.Conv2d):
                mod.weight.normal_(0.0, 0.03, generator=gen)
            elif isinstance(mod, FrozenBatchNorm2d):
                mod.weight.normal_(1.0, 0.2, generator=gen)
                mod.bias.normal_(0.0, 0.2, generator=gen)
                mod.running_mean.normal_(0.0, 0.2, generator=gen)
                mod.running_var.uniform_(0.5, 1.5, generator=gen)
