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

    d2.utils = utils
    d2.config = config_mod
    d2.layers = layers_mod
    utils.registry = registry_mod
    utils.comm = comm_mod

    sys.modules["detectron2"] = d2
    sys.modules["detectron2.utils"] = utils
    sys.modules["detectron2.utils.registry"] = registry_mod
    sys.modules["detectron2.utils.comm"] = comm_mod
    sys.modules["detectron2.config"] = config_mod
    sys.modules["detectron2.layers"] = layers_mod


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


def install() -> None:
    if "detectron2" not in sys.modules:
        _make_detectron2()
    if "fvcore" not in sys.modules:
        _make_fvcore()
    if "quaternion" not in sys.modules:
        _make_quaternion()
    if REFERENCE_ROOT not in sys.path:
        sys.path.insert(0, REFERENCE_ROOT)


install()
