#!/usr/bin/env python
"""Visualization CLI, reference-parity for vis_NopeSAC.py.

Loads NopeSAC_instances_predictions.pth + continuous.pkl (the eval.py
artifact contract) and writes, per pair:
  * <idx>_matching.png       - side-by-side masks + correspondence lines
  * <idx>_scene.obj          - merged planar mesh of both views under the
                               predicted relative camera (+ frustum markers),
                               vertex-colored
  * <idx>_scene_gt.obj       - same using the GT camera
  * <idx>_scene_textured.obj/.mtl/_tex*.png - textured planar scene (UV via
                               plane-rectifying homography) when the source
                               images are readable
  * <idx>_cam_onePP<k>.obj   - camera-only scenes for every one-plane pose
                               hypothesis in camera_onePP (--one-plane-cams)
  * <idx>_scene_gtplanes.obj - GT-plane scene (with --dataset-phase)

Spec: /root/reference/vis_NopeSAC.py:32-596 (load_predictions, save_matching,
save_pair_objects, vis_3DPlanes) + utils/vis.py:103-243 (textured meshes).
"""
from __future__ import annotations

import argparse
import os
import pickle
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from nopesac_tpu.utils.np_geometry import get_coordinate_map
from nopesac_tpu.utils import rle as rle_util
from nopesac_tpu.utils.mesh import (
    camera_frustum_mesh,
    join_meshes,
    planes_to_meshes,
    planes_to_textured_meshes,
    save_obj,
    save_obj_textured,
    transform_mesh,
)
from nopesac_tpu.visualization.vis2d import draw_match, save_affinity_stitched


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
        return np.asarray(Image.open(file_name).convert("RGB").resize((w, h))), True
    return np.full((h, w, 3), 200, np.uint8), False


def _frustum_scene(out_dir, name, cam_pos, cam_rot, extra=()):
    """Camera-only scene: hypothesis frustum (red) + identity view-1 frustum
    (green) + optional reference frustums (vis_3DPlanes 'Cam' renders,
    reference vis_NopeSAC.py:544-564)."""
    meshes = [
        camera_frustum_mesh(cam_pos, cam_rot, color=(0.9, 0.2, 0.2)),
        camera_frustum_mesh([0, 0, 0], [1, 0, 0, 0], color=(0.2, 0.9, 0.2)),
    ]
    for pos, rot, color in extra:
        meshes.append(camera_frustum_mesh(pos, rot, color=color))
    save_obj(out_dir, name, join_meshes(meshes))


def vis_pair(idx, pred, od, out_dir, h=480, w=640, gt_pair=None,
             one_plane_cams=False, textured=True):
    masks0, planes0 = _view_arrays(pred["0"], h, w)
    masks1, planes1 = _view_arrays(pred["1"], h, w)
    corrs = np.argwhere(np.asarray(od["best_assignment"]))
    img0, real0 = _load_image(pred["0"].get("file_name", ""), h, w)
    img1, real1 = _load_image(pred["1"].get("file_name", ""), h, w)

    # 2D matching visualization
    match_img = draw_match(img0, img1, masks0, masks1, corrs)
    from PIL import Image

    Image.fromarray(match_img).save(os.path.join(out_dir, f"{idx}_matching.png"))

    # stitched-affinity heatmap: per-cell Sinkhorn scores + '*' on selected
    # matches (reference visualization.py:53-86, save_affinity_after_stitch)
    if pred.get("pred_aff") is not None:
        aff = np.asarray(pred["pred_aff"])
        ass = np.asarray(od["best_assignment"])
        matching = np.full(aff.shape[0], -1, np.int64)
        rows, cols = np.nonzero(ass)
        matching[rows] = cols
        save_affinity_stitched(aff, aff.shape[0], aff.shape[1], matching,
                               os.path.join(out_dir, f"{idx}_affinity_pred.png"))

    kmap = get_coordinate_map(h=h, w=w)
    pred_cam = od["best_camera"]
    gt_cam = od["gt_camera"]

    # 3D scenes (pred + gt cameras), vertex-colored
    for tag, cam in (("scene", pred_cam), ("scene_gt", gt_cam)):
        meshes0 = planes_to_meshes(masks0, planes0, kmap, img0, step=4)
        meshes1 = planes_to_meshes(masks1, planes1, kmap, img1, step=4)
        pos = np.asarray(cam["position"]).reshape(3)
        rot = np.asarray(cam["rotation"]).reshape(4)
        meshes0 = [transform_mesh(m, pos, rot) for m in meshes0]
        meshes = meshes0 + meshes1
        meshes.append(camera_frustum_mesh(pos, rot, color=(0.9, 0.2, 0.2)))
        meshes.append(camera_frustum_mesh([0, 0, 0], [1, 0, 0, 0], color=(0.2, 0.9, 0.2)))
        save_obj(out_dir, f"{idx}_{tag}", join_meshes(meshes))

    # textured scene (the reference's headline qualitative artifact)
    if textured and (real0 or real1):
        pos = np.asarray(pred_cam["position"]).reshape(3)
        rot = np.asarray(pred_cam["rotation"]).reshape(4)
        tm0 = planes_to_textured_meshes(masks0, planes0, kmap, img0, step=4)
        tm0 = [transform_mesh(m, pos, rot) for m in tm0]
        tm1 = planes_to_textured_meshes(masks1, planes1, kmap, img1, step=4)
        save_obj_textured(out_dir, f"{idx}_scene_textured", tm0 + tm1)

    # GT-plane scene (vis_3DPlanes GT renders, reference vis_NopeSAC.py:543-546)
    if gt_pair is not None:
        gt_meshes = []
        gpos = np.asarray(gt_cam["position"]).reshape(3)
        grot = np.asarray(gt_cam["rotation"]).reshape(4)
        for i, cam_i in (("0", (gpos, grot)), ("1", None)):
            anns = gt_pair[i].get("annotations", [])
            gm = [rle_util.seg_to_mask(a["segmentation"], h, w) for a in anns]
            gp = np.asarray([a["plane"] for a in anns])
            img = img0 if i == "0" else img1
            ms = planes_to_meshes(gm, gp, kmap, img, step=4)
            if cam_i is not None:
                ms = [transform_mesh(m, *cam_i) for m in ms]
            gt_meshes += ms
        save_obj(out_dir, f"{idx}_scene_gtplanes", join_meshes(gt_meshes))

    # one-plane-hypothesis cameras (vis_3DPlanes, reference vis_NopeSAC.py:515-564)
    if one_plane_cams and "camera_onePP" in pred:
        trans = np.asarray(pred["camera_onePP"]["pred"]["tran"]).reshape(-1, 3)
        rots = np.asarray(pred["camera_onePP"]["pred"]["rot"]).reshape(-1, 4)
        extra = [(np.asarray(gt_cam["position"]).reshape(3),
                  np.asarray(gt_cam["rotation"]).reshape(4), (0.2, 0.2, 0.9))]
        for pi in range(len(rots)):
            _frustum_scene(out_dir, f"{idx}_cam_onePP{pi}", trans[pi], rots[pi],
                           extra=extra)
        _frustum_scene(out_dir, f"{idx}_cam_final",
                       np.asarray(pred_cam["position"]).reshape(3),
                       np.asarray(pred_cam["rotation"]).reshape(4), extra=extra)


def main():
    parser = argparse.ArgumentParser(description="NopeSAC visualization")
    parser.add_argument("--rcnn-cached-file", required=True)
    parser.add_argument("--optimized-dict-path", required=True)
    parser.add_argument("--output-dir", default="vis_out")
    parser.add_argument("--num-data", type=int, default=10)
    parser.add_argument("--height", type=int, default=0,
                        help="0 = infer from the prediction RLE masks")
    parser.add_argument("--width", type=int, default=0)
    parser.add_argument("--one-plane-cams", action="store_true",
                        help="render every camera_onePP hypothesis frustum")
    parser.add_argument("--no-textured", action="store_true")
    parser.add_argument("--dataset-phase", default="",
                        help="dataset name for GT-plane scenes (optional)")
    args = parser.parse_args()

    preds = load_predictions(args.rcnn_cached_file)
    with open(args.optimized_dict_path, "rb") as f:
        od = pickle.load(f)
    os.makedirs(args.output_dir, exist_ok=True)

    gt_pairs = None
    if args.dataset_phase:
        import nopesac_tpu.data.datasets  # noqa: F401
        from nopesac_tpu.data.registry import DatasetCatalog

        data = DatasetCatalog.get(args.dataset_phase)
        gt_pairs = {
            d["0"]["image_id"] + "__" + d["1"]["image_id"]: d for d in data
        }

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
        gt_pair = None
        if gt_pairs is not None:
            key = preds[idx]["0"]["image_id"] + "__" + preds[idx]["1"]["image_id"]
            gt_pair = gt_pairs.get(key)
        vis_pair(idx, preds[idx], od[idx], args.output_dir, height, width,
                 gt_pair=gt_pair, one_plane_cams=args.one_plane_cams,
                 textured=not args.no_textured)
        print(f"[{idx + 1}/{n}] wrote visualizations")


if __name__ == "__main__":
    main()
