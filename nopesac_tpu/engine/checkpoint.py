"""Checkpoint save/restore (orbax) + torch-checkpoint import.

Spec: d2 DetectionCheckpointer behaviour (train_NopeSAC.py:239-241,259):
periodic saves, `model_final`, resume restoring model+optimizer+iteration.
"""
from __future__ import annotations

import os
from typing import Any, Optional

import jax
import numpy as np


def _ocp():
    import orbax.checkpoint as ocp

    return ocp


class Checkpointer:
    def __init__(self, output_dir: str):
        self.dir = os.path.abspath(os.path.join(output_dir, "checkpoints"))
        os.makedirs(self.dir, exist_ok=True)
        ocp = _ocp()
        self._ckptr = ocp.PyTreeCheckpointer()

    def save(self, state: Any, step: int, name: Optional[str] = None) -> str:
        tag = name if name is not None else f"step_{step:08d}"
        path = os.path.join(self.dir, tag)
        # EVERY process calls orbax save: under jax.distributed, orbax's
        # save path issues internal cross-process sync barriers, so a
        # "rank 0 alone writes" early return makes rank 0's barriers pair
        # with the other ranks' NEXT unrelated collectives — silently
        # desynchronising every later gather (observed as a hang + shutdown-
        # barrier death in tests/test_two_process.py::test_two_process_
        # midtrain_eval). Orbax itself coordinates so the primary host does
        # the actual writing; the params/opt state are replicated, so each
        # host contributes identical bytes.
        state_host = jax.device_get(state)
        self._ckptr.save(path, state_host, force=True)
        if jax.process_index() == 0:
            with open(os.path.join(self.dir, "last_checkpoint"), "w") as f:
                f.write(tag)
        return path

    def latest(self) -> Optional[str]:
        marker = os.path.join(self.dir, "last_checkpoint")
        if not os.path.exists(marker):
            return None
        with open(marker) as f:
            tag = f.read().strip()
        path = os.path.join(self.dir, tag)
        return path if os.path.exists(path) else None

    def restore(self, target: Any, path: Optional[str] = None) -> Any:
        path = path or self.latest()
        if path is None:
            return target
        return self._ckptr.restore(path, item=target)


def load_orbax_tree(path: str) -> dict:
    """Restore an orbax checkpoint WITHOUT a template: nested plain dicts.

    Used for cross-stage MODEL.WEIGHTS loading, where the consuming model may
    have submodules the checkpoint lacks (curriculum step1 -> step2 adds the
    matching/camera heads) — a same-structure template restore would fail.
    """
    ocp = _ocp()
    return ocp.PyTreeCheckpointer().restore(path)


def _leaf_paths(tree: Any, pfx: str = "") -> list:
    """Dotted paths of every leaf under a nested-dict tree."""
    if not isinstance(tree, dict):
        return [pfx[:-1]]
    out = []
    for k, v in tree.items():
        out.extend(_leaf_paths(v, f"{pfx}{k}."))
    return out


def merge_pytree(template: Any, loaded: Any, prefix: str = ""):
    """Overlay `loaded` onto `template` by matching dict paths + leaf shapes.

    Returns (merged, missing, unexpected): d2 DetectionCheckpointer
    semantics — keys only in the template keep their (fresh-init) values and
    are reported missing; checkpoint-only keys are reported unexpected;
    shape mismatches are treated as missing+unexpected rather than fatal.
    """
    missing: list = []
    unexpected: list = []

    def walk(tpl, ld, pfx):
        if isinstance(tpl, dict):
            out = {}
            ld = ld if isinstance(ld, dict) else {}
            for k, v in tpl.items():
                if k in ld:
                    out[k] = walk(v, ld[k], f"{pfx}{k}.")
                else:
                    missing.append(f"{pfx}{k}")
                    out[k] = v
            for k in ld:
                if k not in tpl:
                    unexpected.append(f"{pfx}{k}")
            return out
        # leaf
        if ld is None:
            missing.append(pfx[:-1])
            return tpl
        if isinstance(ld, dict):
            # template leaf vs checkpoint subtree: the whole checkpoint
            # subtree is dropped — report every discarded leaf so a
            # structurally-drifted curriculum checkpoint never loses
            # trained weights silently
            missing.append(pfx[:-1])
            for sub in _leaf_paths(ld, pfx):
                unexpected.append(sub)
            return tpl
        tpl_arr, ld_arr = np.asarray(tpl), np.asarray(ld)
        if tpl_arr.shape != ld_arr.shape:
            # shape mismatch: template keeps fresh init (missing) AND the
            # checkpoint value is discarded (unexpected) — docstring contract
            missing.append(f"{pfx[:-1]} (shape {ld_arr.shape} != {tpl_arr.shape})")
            unexpected.append(f"{pfx[:-1]} (shape {ld_arr.shape} != {tpl_arr.shape})")
            return tpl
        return ld_arr.astype(tpl_arr.dtype)

    merged = walk(template, loaded, prefix)
    return merged, missing, unexpected


def load_torch_checkpoint(path: str) -> dict:
    """Load a reference .pth checkpoint into {name: np.ndarray} (host-side).

    Used by the torch->jax weight importer (utils/torch_import.py) for
    parity testing against released NopeSAC checkpoints.
    """
    import torch

    blob = torch.load(path, map_location="cpu", weights_only=False)
    state = blob.get("model", blob) if isinstance(blob, dict) else blob
    return {k: np.asarray(v.detach().cpu().numpy()) if hasattr(v, "detach") else np.asarray(v)
            for k, v in state.items()}
