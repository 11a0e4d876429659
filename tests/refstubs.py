"""Minimal stand-ins for the reference repo's external deps so its pure-torch
modules import from /root/reference for numeric parity tests.

The reference (SURVEY.md section 2.3) uses detectron2 only for config/registry
plumbing and thin layer wrappers on these code paths; fvcore only for weight
init; numpy-quaternion for host quat<->matrix conversion. Each shim below
implements just the surface those modules touch - nothing is copied from
detectron2/fvcore (public, well-known APIs re-implemented in a few lines).

Importing this module installs the shims into sys.modules and puts
/root/reference on sys.path. Import it BEFORE importing NopeSAC_Net.*.
"""
from __future__ import annotations

import sys
import types
from dataclasses import dataclass
from typing import Optional

import numpy as np
import torch
from torch import nn

REFERENCE_ROOT = "/root/reference"


# ---------------------------------------------------------------- detectron2
def _make_detectron2() -> None:
    d2 = types.ModuleType("detectron2")

    # --- utils.registry ---
    utils = types.ModuleType("detectron2.utils")
    registry_mod = types.ModuleType("detectron2.utils.registry")

    class Registry:
        def __init__(self, name):
            self._name = name
            self._map = {}
            self.__doc__ = ""

        def register(self, obj=None):
            if obj is None:
                def deco(o):
                    self._map[o.__name__] = o
                    return o
                return deco
            self._map[obj.__name__] = obj
            return obj

        def get(self, name):
            return self._map[name]

    registry_mod.Registry = Registry

    comm_mod = types.ModuleType("detectron2.utils.comm")
    comm_mod.get_world_size = lambda: 1
    comm_mod.get_rank = lambda: 0
    comm_mod.is_main_process = lambda: True

    # --- config.configurable ---
    config_mod = types.ModuleType("detectron2.config")

    def configurable(init_func=None, *, from_config=None):
        """d2-style decorator: __init__ may be called with (cfg, ...) and the
        class's from_config(cfg, ...) expands it to explicit kwargs."""
        if init_func is not None:
            import functools

            @functools.wraps(init_func)
            def wrapped(self, *args, **kwargs):
                is_cfg = (args and _is_cfg(args[0])) or _is_cfg(kwargs.get("cfg"))
                if is_cfg:
                    from_cfg = type(self).from_config
                    if args:
                        explicit = from_cfg(*args, **kwargs)
                    else:
                        explicit = from_cfg(**kwargs)
                    init_func(self, **explicit)
                else:
                    init_func(self, *args, **kwargs)

            return wrapped

        def deco(f):
            return f

        return deco

    def _is_cfg(obj) -> bool:
        return obj is not None and obj.__class__.__name__ in ("CfgNode", "CN")

    config_mod.configurable = configurable

    # --- layers ---
    layers_mod = types.ModuleType("detectron2.layers")

    @dataclass
    class ShapeSpec:
        channels: Optional[int] = None
        height: Optional[int] = None
        width: Optional[int] = None
        stride: Optional[int] = None

    class Conv2d(nn.Conv2d):
        """nn.Conv2d + optional norm/activation (d2's thin wrapper API)."""

        def __init__(self, *args, **kwargs):
            norm = kwargs.pop("norm", None)
            activation = kwargs.pop("activation", None)
            super().__init__(*args, **kwargs)
            self.norm = norm
            self.activation = activation

        def forward(self, x):
            x = super().forward(x)
            if self.norm is not None:
                x = self.norm(x)
            if self.activation is not None:
                x = self.activation(x)
            return x

    class FrozenBatchNorm2d(nn.Module):
        def __init__(self, num_features, eps=1e-5):
            super().__init__()
            self.register_buffer("weight", torch.ones(num_features))
            self.register_buffer("bias", torch.zeros(num_features))
            self.register_buffer("running_mean", torch.zeros(num_features))
            self.register_buffer("running_var", torch.ones(num_features))
            self.eps = eps

        def forward(self, x):
            scale = self.weight * (self.running_var + self.eps).rsqrt()
            bias = self.bias - self.running_mean * scale
            return x * scale[None, :, None, None] + bias[None, :, None, None]

    def get_norm(norm, out_channels):
        if not norm:
            return None
        if isinstance(norm, str):
            return {
                "GN": lambda c: nn.GroupNorm(32, c),
                "BN": nn.BatchNorm2d,
                "SyncBN": nn.BatchNorm2d,
                "FrozenBN": FrozenBatchNorm2d,
            }[norm](out_channels)
        return norm(out_channels)

    layers_mod.ShapeSpec = ShapeSpec
    layers_mod.Conv2d = Conv2d
    layers_mod.FrozenBatchNorm2d = FrozenBatchNorm2d
    layers_mod.get_norm = get_norm

    # --- data / structures / modeling / logging (meta-arch import chain) ---
    data_mod = types.ModuleType("detectron2.data")

    class _Metadata:
        def __init__(self):
            self.__dict__["_d"] = {}

        def __getattr__(self, k):
            return self.__dict__["_d"].get(k)

        def __setattr__(self, k, v):
            self.__dict__["_d"][k] = v

        def get(self, k, default=None):
            return self.__dict__["_d"].get(k, default)

        def set(self, **kw):
            self.__dict__["_d"].update(kw)
            return self

    class _MetadataCatalog:
        _store: dict = {}

        @classmethod
        def get(cls, name):
            return cls._store.setdefault(name, _Metadata())

    data_mod.MetadataCatalog = _MetadataCatalog

    structures_mod = types.ModuleType("detectron2.structures")

    class ImageList:
        """Padded batch of images + per-image sizes (d2's public surface)."""

        def __init__(self, tensor, image_sizes):
            self.tensor = tensor
            self.image_sizes = image_sizes

        def __len__(self):
            return len(self.image_sizes)

        def __getitem__(self, idx):
            h, w = self.image_sizes[idx]
            return self.tensor[idx, ..., :h, :w]

        @staticmethod
        def from_tensors(tensors, size_divisibility=0, pad_value=0.0):
            sizes = [(int(t.shape[-2]), int(t.shape[-1])) for t in tensors]
            max_h = max(s[0] for s in sizes)
            max_w = max(s[1] for s in sizes)
            if size_divisibility > 1:
                d = size_divisibility
                max_h = (max_h + d - 1) // d * d
                max_w = (max_w + d - 1) // d * d
            batch = tensors[0].new_full(
                (len(tensors), tensors[0].shape[0], max_h, max_w), pad_value)
            for i, t in enumerate(tensors):
                batch[i, :, : t.shape[-2], : t.shape[-1]].copy_(t)
            return ImageList(batch, sizes)

    class Instances:
        def __init__(self, image_size, **kwargs):
            self._image_size = image_size
            self._fields = {}
            for k, v in kwargs.items():
                self.set(k, v)

        @property
        def image_size(self):
            return self._image_size

        def set(self, k, v):
            self._fields[k] = v

        def has(self, k):
            return k in self._fields

        def get(self, k):
            return self._fields[k]

        def __getattr__(self, k):
            if k.startswith("_"):
                raise AttributeError(k)
            if k in self.__dict__.get("_fields", {}):
                return self._fields[k]
            raise AttributeError(k)

        def __setattr__(self, k, v):
            if k.startswith("_"):
                super().__setattr__(k, v)
            else:
                self._fields[k] = v

        def __len__(self):
            for v in self._fields.values():
                return len(v)
            return 0

    structures_mod.ImageList = ImageList
    structures_mod.Instances = Instances

    modeling_mod = types.ModuleType("detectron2.modeling")
    modeling_mod.META_ARCH_REGISTRY = Registry("META_ARCH")
    modeling_mod.SEM_SEG_HEADS_REGISTRY = Registry("SEM_SEG_HEADS")
    modeling_mod.build_sem_seg_head = None

    backbone_mod = types.ModuleType("detectron2.modeling.backbone")

    class Backbone(nn.Module):
        def output_shape(self):
            return {}

    backbone_mod.Backbone = Backbone

    # --- d2-faithful ResNet-50 (clean-room from the architecture the
    # reference pins: build_resnet_backbone, DEPTH=50, STEM_OUT_CHANNELS=64,
    # STRIDE_IN_1X1=False i.e. stride on the 3x3 conv, FrozenBN, OUT_FEATURES
    # res2-res5 — /root/reference/configs/Base.yaml:1-12). State-dict naming
    # follows the d2 checkpoint convention (stem.conv1.*, resN.B.convK.*,
    # resN.B.shortcut.*, each with .norm.{weight,bias,running_mean,
    # running_var}) so released-checkpoint import paths are exercised 1:1. ---
    class _BottleneckBlock(nn.Module):
        def __init__(self, in_ch, bottleneck_ch, out_ch, stride):
            super().__init__()
            self.conv1 = Conv2d(in_ch, bottleneck_ch, 1, stride=1, bias=False,
                                norm=FrozenBatchNorm2d(bottleneck_ch))
            self.conv2 = Conv2d(bottleneck_ch, bottleneck_ch, 3, stride=stride,
                                padding=1, bias=False,
                                norm=FrozenBatchNorm2d(bottleneck_ch))
            self.conv3 = Conv2d(bottleneck_ch, out_ch, 1, bias=False,
                                norm=FrozenBatchNorm2d(out_ch))
            if in_ch != out_ch or stride != 1:
                self.shortcut = Conv2d(in_ch, out_ch, 1, stride=stride,
                                       bias=False,
                                       norm=FrozenBatchNorm2d(out_ch))
            else:
                self.shortcut = None

        def forward(self, x):
            out = torch.relu(self.conv1(x))
            out = torch.relu(self.conv2(out))
            out = self.conv3(out)
            sc = self.shortcut(x) if self.shortcut is not None else x
            return torch.relu(out + sc)

    class _Stem(nn.Module):
        def __init__(self, out_ch=64):
            super().__init__()
            self.conv1 = Conv2d(3, out_ch, 7, stride=2, padding=3, bias=False,
                                norm=FrozenBatchNorm2d(out_ch))

        def forward(self, x):
            x = torch.relu(self.conv1(x))
            return nn.functional.max_pool2d(x, kernel_size=3, stride=2,
                                            padding=1)

    class RefResNet50(Backbone):
        _STAGES = (("res2", 3, 64, 256, 1), ("res3", 4, 128, 512, 2),
                   ("res4", 6, 256, 1024, 2), ("res5", 3, 512, 2048, 2))

        def __init__(self):
            super().__init__()
            self.stem = _Stem(64)
            in_ch = 64
            for name, n_blocks, bneck, out_ch, stride in self._STAGES:
                blocks = []
                for b in range(n_blocks):
                    blocks.append(_BottleneckBlock(
                        in_ch, bneck, out_ch, stride if b == 0 else 1))
                    in_ch = out_ch
                setattr(self, name, nn.Sequential(*blocks))
            self.size_divisibility = 0

        def forward(self, x):
            x = self.stem(x)
            out = {}
            for name, *_ in self._STAGES:
                x = getattr(self, name)(x)
                out[name] = x
            return out

        def output_shape(self):
            strides = {"res2": 4, "res3": 8, "res4": 16, "res5": 32}
            return {name: ShapeSpec(channels=out_ch, stride=strides[name])
                    for name, _, _, out_ch, _ in self._STAGES}

    def build_backbone(cfg, input_shape=None):
        assert cfg.MODEL.BACKBONE.NAME == "build_resnet_backbone"
        assert cfg.MODEL.RESNETS.DEPTH == 50
        return RefResNet50()

    modeling_mod.build_backbone = build_backbone
    backbone_mod.RefResNet50 = RefResNet50

    postproc_mod = types.ModuleType("detectron2.modeling.postprocessing")

    def sem_seg_postprocess(result, img_size, output_height, output_width):
        result = result[:, : img_size[0], : img_size[1]].expand(1, -1, -1, -1)
        return torch.nn.functional.interpolate(
            result, size=(output_height, output_width), mode="bilinear",
            align_corners=False)[0]

    postproc_mod.sem_seg_postprocess = sem_seg_postprocess

    logger_mod = types.ModuleType("detectron2.utils.logger")
    logger_mod.setup_logger = lambda *a, **k: __import__("logging").getLogger("d2")

    d2.utils = utils
    d2.config = config_mod
    d2.layers = layers_mod
    d2.data = data_mod
    d2.structures = structures_mod
    d2.modeling = modeling_mod
    utils.registry = registry_mod
    utils.comm = comm_mod
    utils.logger = logger_mod
    modeling_mod.backbone = backbone_mod
    modeling_mod.postprocessing = postproc_mod

    sys.modules["detectron2"] = d2
    sys.modules["detectron2.utils"] = utils
    sys.modules["detectron2.utils.registry"] = registry_mod
    sys.modules["detectron2.utils.comm"] = comm_mod
    sys.modules["detectron2.utils.logger"] = logger_mod
    sys.modules["detectron2.config"] = config_mod
    sys.modules["detectron2.layers"] = layers_mod
    sys.modules["detectron2.data"] = data_mod
    sys.modules["detectron2.structures"] = structures_mod
    sys.modules["detectron2.modeling"] = modeling_mod
    sys.modules["detectron2.modeling.backbone"] = backbone_mod
    sys.modules["detectron2.modeling.postprocessing"] = postproc_mod


# -------------------------------------------------------------------- fvcore
def _make_fvcore() -> None:
    fv = types.ModuleType("fvcore")
    fvnn = types.ModuleType("fvcore.nn")
    wi = types.ModuleType("fvcore.nn.weight_init")

    def c2_xavier_fill(module):
        nn.init.kaiming_uniform_(module.weight, a=1)
        if module.bias is not None:
            nn.init.constant_(module.bias, 0)

    def c2_msra_fill(module):
        nn.init.kaiming_normal_(module.weight, mode="fan_out", nonlinearity="relu")
        if module.bias is not None:
            nn.init.constant_(module.bias, 0)

    wi.c2_xavier_fill = c2_xavier_fill
    wi.c2_msra_fill = c2_msra_fill
    fv.nn = fvnn
    fvnn.weight_init = wi
    sys.modules["fvcore"] = fv
    sys.modules["fvcore.nn"] = fvnn
    sys.modules["fvcore.nn.weight_init"] = wi


# -------------------------------------------- numpy-quaternion (tiny subset)
def _make_quaternion() -> None:
    q = types.ModuleType("quaternion")

    def from_rotation_vector(rv):
        rv = np.asarray(rv, np.float64)
        single = rv.ndim == 1
        rv = np.atleast_2d(rv)
        angle = np.linalg.norm(rv, axis=-1, keepdims=True)
        axis = rv / np.where(angle > 1e-12, angle, 1.0)
        half = angle[..., 0] / 2.0
        out = np.concatenate(
            [np.cos(half)[..., None], np.sin(half)[..., None] * axis], axis=-1
        )
        return out[0] if single else out

    def as_float_array(x):
        return np.asarray(x, np.float64)

    def from_float_array(x):
        return np.asarray(x, np.float64)

    def _quat_to_mat(w, x, y, z):
        n = w * w + x * x + y * y + z * z
        s = 0.0 if n == 0 else 2.0 / n
        return np.array([
            [1 - s * (y * y + z * z), s * (x * y - w * z), s * (x * z + w * y)],
            [s * (x * y + w * z), 1 - s * (x * x + z * z), s * (y * z - w * x)],
            [s * (x * z - w * y), s * (y * z + w * x), 1 - s * (x * x + y * y)],
        ])

    def as_rotation_matrix(qa):
        qa = np.asarray(qa, np.float64)
        if qa.ndim == 1:
            return _quat_to_mat(*qa)
        return np.stack([_quat_to_mat(*row) for row in qa.reshape(-1, 4)]).reshape(
            qa.shape[:-1] + (3, 3)
        )

    def from_rotation_matrix(m):
        m = np.asarray(m, np.float64)
        w = np.sqrt(max(0.0, 1.0 + m[0, 0] + m[1, 1] + m[2, 2])) / 2.0
        x = (m[2, 1] - m[1, 2]) / (4 * w)
        y = (m[0, 2] - m[2, 0]) / (4 * w)
        z = (m[1, 0] - m[0, 1]) / (4 * w)
        return np.array([w, x, y, z])

    q.from_rotation_vector = from_rotation_vector
    q.as_float_array = as_float_array
    q.from_float_array = from_float_array
    q.as_rotation_matrix = as_rotation_matrix
    q.from_rotation_matrix = from_rotation_matrix
    sys.modules["quaternion"] = q


# ------------------------------------- pycocotools (backed by our C++ codec)
def _make_pycocotools() -> None:
    import os as _os
    import sys as _sys

    _sys.path.insert(0, _os.path.join(_os.path.dirname(__file__), ".."))
    from nopesac_tpu.utils import rle as _rle

    pc = types.ModuleType("pycocotools")
    mask_mod = types.ModuleType("pycocotools.mask")

    def _one_or_many(fn):
        def wrapped(objs, *a, **k):
            if isinstance(objs, (list, tuple)):
                return [fn(o, *a, **k) for o in objs]
            return fn(objs, *a, **k)
        return wrapped

    def _encode(m):
        if m.ndim == 3:  # fortran-order [h, w, n]
            return [_rle.encode(np.asfortranarray(m[:, :, i])) for i in range(m.shape[2])]
        return _rle.encode(np.asarray(m))

    mask_mod.encode = _encode
    mask_mod.decode = _one_or_many(_rle.decode)
    mask_mod.area = _one_or_many(_rle.area)
    mask_mod.toBbox = _one_or_many(_rle.to_bbox)
    mask_mod.iou = _rle.iou
    mask_mod.merge = _rle.merge
    mask_mod.frPyObjects = lambda objs, h, w: objs  # used only on RLE inputs here
    pc.mask = mask_mod
    sys.modules["pycocotools"] = pc
    sys.modules["pycocotools.mask"] = mask_mod


def _make_torchvision() -> None:
    tv = types.ModuleType("torchvision")
    tv.__version__ = "0.0-stub"
    tv._is_tracing = lambda: False
    tv.ops = types.ModuleType("torchvision.ops")
    sys.modules["torchvision"] = tv
    sys.modules["torchvision.ops"] = tv.ops


def install() -> None:
    if "detectron2" not in sys.modules:
        _make_detectron2()
    if "fvcore" not in sys.modules:
        _make_fvcore()
    if "quaternion" not in sys.modules:
        _make_quaternion()
    if "pycocotools" not in sys.modules:
        _make_pycocotools()
    if "torchvision" not in sys.modules:
        _make_torchvision()
    if REFERENCE_ROOT not in sys.path:
        # APPEND, never prepend: the reference checkout has top-level modules
        # named identically to ours (eval.py, train_NopeSAC.py, ...) and must
        # not shadow them for tests that import the repo's CLIs (the repo
        # root sits at sys.path[0] via conftest). Only `NopeSAC_Net.*` is
        # resolved from here.
        sys.path.append(REFERENCE_ROOT)


install()
