#!/usr/bin/env python
"""Visualization CLI, reference-parity for vis_NopeSAC.py.

Loads NopeSAC_instances_predictions.pth + continuous.pkl (the eval.py
artifact contract) and writes, per pair:
  * <idx>_matching.png  - side-by-side masks + correspondence lines
  * <idx>_scene.obj     - merged textured planar mesh of both views with the
                          predicted relative camera (+ frustum markers)
  * <idx>_scene_gt.obj  - same using the GT camera

Spec: /root/reference/vis_NopeSAC.py:32-596 (load_predictions, save_matching,
save_pair_objects, vis_3DPlanes).
"""
from __future__ import annotations

import argparse
import os
import pickle
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from nopesac_tpu.core.geometry import get_coordinate_map
from nopesac_tpu.utils import rle as rle_util
from nopesac_tpu.utils.mesh import (
    camera_frustum_mesh,
    join_meshes,
    planes_to_meshes,
    save_obj,
    transform_mesh,
)
from nopesac_tpu.visualization.vis2d import draw_match


def load_predictions(path: str):
    import torch

    with open(path, "rb") as f:
        return torch.load(f, weights_only=False)


def _view_arrays(pred_view, height, width):
    masks = [rle_util.decode(ins["segmentation"]) for ins in pred_view["instances"]]
    planes = np.asarray(pred_view["pred_plane"])
    return masks, planes


def _load_image(file_name, h, w):
    from PIL import Image

    if file_name and os.path.exists(file_name):
        return np.asarray(Image.open(file_name).convert("RGB").resize((w, h)))
    return np.full((h, w, 3), 200, np.uint8)


def vis_pair(idx, pred, od, out_dir, h=480, w=640):
    masks0, planes0 = _view_arrays(pred["0"], h, w)
    masks1, planes1 = _view_arrays(pred["1"], h, w)
    corrs = np.argwhere(np.asarray(od["best_assignment"]))
    img0 = _load_image(pred["0"].get("file_name", ""), h, w)
    img1 = _load_image(pred["1"].get("file_name", ""), h, w)

    # 2D matching visualization
    match_img = draw_match(img0, img1, masks0, masks1, corrs)
    from PIL import Image

    Image.fromarray(match_img).save(os.path.join(out_dir, f"{idx}_matching.png"))

    # 3D scenes (pred + gt cameras)
    kmap = np.asarray(get_coordinate_map(h=h, w=w))
    for tag, cam in (("scene", od["best_camera"]), ("scene_gt", od["gt_camera"])):
        meshes0 = planes_to_meshes(masks0, planes0, kmap, img0, step=4)
        meshes1 = planes_to_meshes(masks1, planes1, kmap, img1, step=4)
        pos = np.asarray(cam["position"]).reshape(3)
        rot = np.asarray(cam["rotation"]).reshape(4)
        meshes0 = [transform_mesh(m, pos, rot) for m in meshes0]
        meshes = meshes0 + meshes1
        meshes.append(camera_frustum_mesh(pos, rot, color=(0.9, 0.2, 0.2)))
        meshes.append(camera_frustum_mesh([0, 0, 0], [1, 0, 0, 0], color=(0.2, 0.9, 0.2)))
        save_obj(out_dir, f"{idx}_{tag}", join_meshes(meshes))


def main():
    parser = argparse.ArgumentParser(description="NopeSAC visualization")
    parser.add_argument("--rcnn-cached-file", required=True)
    parser.add_argument("--optimized-dict-path", required=True)
    parser.add_argument("--output-dir", default="vis_out")
    parser.add_argument("--num-data", type=int, default=10)
    parser.add_argument("--height", type=int, default=0,
                        help="0 = infer from the prediction RLE masks")
    parser.add_argument("--width", type=int, default=0)
    args = parser.parse_args()

    preds = load_predictions(args.rcnn_cached_file)
    with open(args.optimized_dict_path, "rb") as f:
        od = pickle.load(f)
    os.makedirs(args.output_dir, exist_ok=True)

    height, width = args.height, args.width
    if not (height and width):
        # infer the artifact resolution from the first stored RLE so the
        # tool works on any eval run (smoke configs use small frames)
        for p in preds:
            for view in ("0", "1"):
                for inst in p.get(view, {}).get("instances", []):
                    seg = inst.get("segmentation")
                    if isinstance(seg, dict) and "size" in seg:
                        height, width = int(seg["size"][0]), int(seg["size"][1])
                        break
                if height:
                    break
            if height:
                break
        if not (height and width):
            height, width = 480, 640

    n = len(preds) if args.num_data < 0 else min(args.num_data, len(preds))
    for idx in range(n):
        vis_pair(idx, preds[idx], od[idx], args.output_dir, height, width)
        print(f"[{idx + 1}/{n}] wrote visualizations")


if __name__ == "__main__":
    main()
