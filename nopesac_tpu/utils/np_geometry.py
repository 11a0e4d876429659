"""Numpy host-side geometry twins of core/geometry.py.

Used by the offline evaluator and mesh/vis tools (specs:
utils/mesh_utils.py:89-130, camera_modules.py:120-162). Quaternions are
(w, x, y, z) float arrays; no numpy-quaternion dependency.
"""
from __future__ import annotations

import numpy as np

SUNCG_TO_HABITAT = np.array([1.0, -1.0, -1.0])


def quat_to_rotmat(q: np.ndarray) -> np.ndarray:
    """[..., 4] -> [..., 3, 3] (does not normalise)."""
    q = np.asarray(q, dtype=np.float64)
    w, x, y, z = np.moveaxis(q, -1, 0)
    m = np.stack([
        1 - 2 * y * y - 2 * z * z, 2 * x * y - 2 * w * z, 2 * x * z + 2 * w * y,
        2 * x * y + 2 * w * z, 1 - 2 * x * x - 2 * z * z, 2 * y * z - 2 * w * x,
        2 * x * z - 2 * w * y, 2 * y * z + 2 * w * x, 1 - 2 * x * x - 2 * y * y,
    ], axis=-1)
    return m.reshape(q.shape[:-1] + (3, 3))


def quat_conjugate(q: np.ndarray) -> np.ndarray:
    return np.asarray(q) * np.array([1.0, -1.0, -1.0, -1.0])


def plane_params_to_global(planes: np.ndarray, position, rotation) -> np.ndarray:
    """suncg-frame n*d params -> global (habitat) frame
    (mesh_utils.py:89-106, get_plane_params_in_global)."""
    planes = np.asarray(planes, dtype=np.float64).reshape(-1, 3)
    tran = np.asarray(position, dtype=np.float64).reshape(3)
    rot = quat_to_rotmat(np.asarray(rotation, dtype=np.float64).reshape(4))
    start = np.ones((len(planes), 3)) * tran
    end = (rot @ (planes * SUNCG_TO_HABITAT).T).T + tran
    a = end
    b = end - start
    denom = np.maximum(np.linalg.norm(b, axis=1) ** 2, 1e-12)
    return ((a * b).sum(axis=1) / denom).reshape(-1, 1) * b


def plane_params_to_local(planes: np.ndarray, position, rotation) -> np.ndarray:
    """Inverse of plane_params_to_global (mesh_utils.py:108-130)."""
    planes = np.asarray(planes, dtype=np.float64).reshape(-1, 3)
    tran = np.asarray(position, dtype=np.float64).reshape(3)
    q = np.asarray(rotation, dtype=np.float64).reshape(4)
    q = q / np.linalg.norm(q)
    b = planes
    a = np.ones((len(planes), 3)) * tran
    denom = np.maximum(np.linalg.norm(b, axis=1) ** 2, 1e-12)
    planes_world = a + b - ((a * b).sum(axis=1) / denom).reshape(-1, 1) * b
    r_inv = quat_to_rotmat(quat_conjugate(q))
    end = (r_inv @ (planes_world - tran).T).T
    return end * SUNCG_TO_HABITAT
