"""Cross-host gathering of arbitrary Python objects (eval results).

TPU-native replacement for detectron2's comm.gather of per-rank prediction
lists (mp3d_evaluation.py:317-319): objects are pickled to bytes, padded to
a common length, and exchanged with
jax.experimental.multihost_utils.process_allgather over the ICI/DCN fabric.
Single-process setups short-circuit.
"""
from __future__ import annotations

import pickle
from typing import Any, List

import numpy as np


def all_gather_objects(obj: Any) -> List[Any]:
    """Return [obj_from_process_0, obj_from_process_1, ...]."""
    import jax

    if jax.process_count() == 1:
        return [obj]

    from jax.experimental import multihost_utils

    payload = np.frombuffer(pickle.dumps(obj, protocol=pickle.HIGHEST_PROTOCOL),
                            dtype=np.uint8)
    local_len = np.asarray([payload.size], np.int64)
    all_lens = np.asarray(multihost_utils.process_allgather(local_len)).reshape(-1)
    max_len = int(all_lens.max())
    padded = np.zeros(max_len, np.uint8)
    padded[: payload.size] = payload
    gathered = np.asarray(multihost_utils.process_allgather(padded))
    gathered = gathered.reshape(len(all_lens), max_len)
    return [pickle.loads(gathered[i, : int(all_lens[i])].tobytes())
            for i in range(len(all_lens))]


def is_main_process() -> bool:
    import jax

    return jax.process_index() == 0
