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
        state_host = jax.device_get(state)
        self._ckptr.save(path, state_host, force=True)
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
