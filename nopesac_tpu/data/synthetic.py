"""Synthetic geometrically-consistent sparse-view pair generator.

Produces pair dicts in the same schema as the cached_set JSONs
(data/datasets/mp3d.py:18-45) so tests and benchmarks can exercise the full
mapper -> model -> evaluator pipeline without the MP3D/ScanNet raw data.

Geometry: sample a relative pose and view-0 planes; view-1 plane params are
derived through the exact plane warp so matching/pose modules have
analytically-known optima (SURVEY.md section 4, fixture strategy).
"""
from __future__ import annotations

from typing import List

import numpy as np

from ..core import metrics  # noqa: F401  (kept for parity tooling)
from ..utils import rle as rle_util


def _quat_to_rotmat_np(q):
    w, x, y, z = q
    return np.array([
        [1 - 2 * y * y - 2 * z * z, 2 * x * y - 2 * w * z, 2 * x * z + 2 * w * y],
        [2 * x * y + 2 * w * z, 1 - 2 * x * x - 2 * z * z, 2 * y * z - 2 * w * x],
        [2 * x * z - 2 * w * y, 2 * y * z + 2 * w * x, 1 - 2 * x * x - 2 * y * y],
    ])


FLIP = np.array([1.0, -1.0, -1.0])


def _warp_plane_np(p, q, t):
    """Reference plane warp (camera_head.py:1427-1465) in numpy."""
    r = _quat_to_rotmat_np(q)
    end = r @ (p * FLIP) + t
    b = end - t
    scale = float(end @ b) / (np.linalg.norm(b) + 1e-5) ** 2
    return scale * b


def make_pair(rng: np.random.Generator, n_planes: int = 6, h: int = 480, w: int = 640,
              pair_id: int = 0) -> dict:
    # relative pose: modest rotation + translation, w >= 0
    rv = rng.normal(size=3) * 0.3
    angle = np.linalg.norm(rv)
    axis = rv / max(angle, 1e-9)
    q = np.concatenate([[np.cos(angle / 2)], np.sin(angle / 2) * axis])
    if q[0] < 0:
        q = -q
    t = rng.normal(size=3) * 0.5

    views = {"0": [], "1": []}
    gt_corrs = []
    for i in range(n_planes):
        normal = rng.normal(size=3)
        normal /= np.linalg.norm(normal)
        offset = rng.uniform(0.5, 4.0)
        p0 = normal * offset
        # view-1 param: global frame of view1 is the identity warp (axis flip),
        # so p1 = FLIP * warp(p0 through the pose)
        p1 = FLIP * _warp_plane_np(p0, q, t)
        views["0"].append(p0)
        views["1"].append(p1)
        gt_corrs.append([i, i])

    def build_view(idx: str, planes) -> dict:
        annos = []
        cell_w, cell_h = w // 4, h // 3
        for i, p in enumerate(planes):
            gx, gy = i % 4, (i // 4) % 3
            x0, y0 = gx * cell_w + 8, gy * cell_h + 8
            x1, y1 = x0 + cell_w - 16, y0 + cell_h - 16
            mask = np.zeros((h, w), np.uint8)
            mask[y0:y1, x0:x1] = 1
            r = rle_util.encode(mask)
            annos.append({
                "bbox": [x0, y0, x1, y1],
                "bbox_mode": 0,  # XYXY_ABS
                "category_id": 0,
                "segmentation": {"size": [h, w], "counts": r["counts"].decode("ascii")},
                "plane": [float(v) for v in p],
            })
        return {
            "file_name": f"/nonexistent/synth_{pair_id}_{idx}.jpg",
            "image_id": f"synth{pair_id}_{idx}",
            "height": h,
            "width": w,
            "annotations": annos,
        }

    return {
        "0": build_view("0", views["0"]),
        "1": build_view("1", views["1"]),
        "rel_pose": {"position": [float(v) for v in t], "rotation": [float(v) for v in q]},
        "gt_corrs": gt_corrs,
    }


def make_dataset(n_pairs: int = 8, n_planes: int = 6, seed: int = 0,
                 h: int = 480, w: int = 640) -> List[dict]:
    rng = np.random.default_rng(seed)
    return [make_pair(rng, n_planes=n_planes, h=h, w=w, pair_id=i) for i in range(n_pairs)]
