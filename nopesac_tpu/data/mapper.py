"""Pair mapper: dataset pair dicts -> fixed-shape numpy training samples.

Spec: data/planercnn_transforms.py (PlaneRCNNMapper) +
siamese_planeTR.py:475-532 (prepare_targets). TPU redesign: instead of
ragged detectron2 Instances, every sample is padded to NQ=50 plane slots
with validity masks so batches have static shapes.

Mask sources, in priority order (call_mp3d:229-263 / call_scannet:327-355):
  1. mp3d: per-view observation pickle (semantic_sensor / depth_sensor)
  2. scannet: twoView_Anns pickle (plane_masks, camera_K) + depth png
  3. fallback: the annotations' own COCO segmentations (polygon or RLE) -
     this also makes the pipeline usable without the raw observation dumps.
"""
from __future__ import annotations

import os
import pickle
from typing import Dict, Optional

import numpy as np

from ..core import geometry as geo
from ..utils import rle as rle_util
from . import packing
from .cam_bins import CameraBins

MP3D_PATH_PREFIX = "/Pool1/users/jinlinyi/dataset/mp3d_rpnet_v4_sep20/"


_DEFAULT_FOCAL = 517.97
_DEFAULT_K = np.array(
    [[_DEFAULT_FOCAL, 0, 320.0], [0, _DEFAULT_FOCAL, 240.0], [0, 0, 1.0]],
    np.float32)


def _np_coordinate_map(h, w, k_matrix=None):
    if k_matrix is None:
        k_matrix = _DEFAULT_K
    k_inv = np.linalg.inv(np.asarray(k_matrix, np.float64)).astype(np.float32)
    x = (np.arange(w, dtype=np.float32) / w * 640.0)[None, :].repeat(h, 0)
    y = (np.arange(h, dtype=np.float32) / h * 480.0)[:, None].repeat(w, 1)
    xy1 = np.stack([x, y, np.ones((h, w), np.float32)]).reshape(3, -1)
    return (k_inv @ xy1).reshape(3, h, w)


class PairMapper:
    """Callable mapping one dataset pair dict to fixed-shape numpy arrays."""

    def __init__(
        self,
        is_train: bool = True,
        dataset_kind: str = "mp3d",
        root_dir: str = "",
        num_queries: int = 50,
        image_size=(480, 640),
        pixel_mean=(123.675, 116.280, 103.530),
        pixel_std=(58.395, 57.120, 57.375),
        camera_on: bool = True,
        load_bins: bool = False,
        eval_gt_box: bool = False,
        depth_on: bool = True,
        augmentation: bool = False,
        seed: int = 42,
        camera_cls_on: bool = False,
        raw_uint8: bool = False,
    ):
        self.is_train = is_train
        self.kind = dataset_kind
        self.root_dir = root_dir
        self.nq = num_queries
        self.h, self.w = image_size
        self.pixel_mean = np.asarray(pixel_mean, np.float32)
        self.pixel_std = np.asarray(pixel_std, np.float32)
        self._pixel_inv_std = (1.0 / self.pixel_std).astype(np.float32)
        # raw_uint8: emit post-resize uint8 images and let the consumer
        # normalise on DEVICE ((f32(u8) - mean) * 1/std — identical IEEE f32
        # ops, bit-equal results). Images are uint8 at the source (PIL), so
        # this is lossless and ships 4x fewer bytes host->device (the eval
        # pipeline's dominant cost through the tunnel; PERF.md round 5).
        # Eval-only: augmentation produces non-integral pixels.
        self.raw_uint8 = raw_uint8
        if raw_uint8 and augmentation:
            raise ValueError("raw_uint8 transport is eval-only "
                             "(augmentation emits non-integral pixels)")
        self.camera_on = camera_on
        self.eval_gt_box = eval_gt_box
        self.depth_on = depth_on
        self.augmentation = augmentation and is_train
        self.camera_cls_on = camera_cls_on
        self._aug_rng = np.random.default_rng(seed)
        self.bins: Optional[CameraBins] = None
        if load_bins and camera_on:
            try:
                self.bins = CameraBins(dataset=dataset_kind)
            except Exception:
                self.bins = None
        # wire format ships k_inv (3x3) instead of the 3xHxW ray map; the
        # f64 inverse here keeps parity with _np_coordinate_map
        self.default_kinv = np.linalg.inv(
            np.asarray(_DEFAULT_K, np.float64)).astype(np.float32)

    # ---------------- image / mask IO ----------------
    def _read_image(self, path: str) -> np.ndarray:
        from PIL import Image

        img = np.asarray(Image.open(path).convert("RGB"), np.float32)
        if img.shape[:2] != (self.h, self.w):
            img = np.asarray(
                Image.open(path).convert("RGB").resize((self.w, self.h)), np.float32
            )
        return img

    def _mp3d_obs(self, view: dict):
        house, img_id = view["image_id"].split("_", 1)
        path = os.path.join(self.root_dir, "observations", house, img_id + ".pkl")
        if not os.path.exists(path):
            return None
        with open(path, "rb") as f:
            return pickle.load(f)

    def _scannet_ann(self, view: dict):
        scene_idx, image_idx = view["image_id"].split("-")
        path = os.path.join(self.root_dir, "twoView_Anns", scene_idx, image_idx + ".pkl")
        if not os.path.exists(path):
            return None
        with open(path, "rb") as f:
            return pickle.load(f)

    def _masks_from_annotations(self, view: dict) -> np.ndarray:
        annos = view.get("annotations", [])
        masks = []
        for ann in annos[: self.nq]:
            seg = ann.get("segmentation")
            if seg is None:
                masks.append(np.zeros((self.h, self.w), np.uint8))
            else:
                m = rle_util.seg_to_mask(seg, view.get("height", self.h), view.get("width", self.w))
                if m.shape != (self.h, self.w):
                    from PIL import Image

                    m = np.asarray(
                        Image.fromarray(m * 255).resize((self.w, self.h)), np.uint8
                    ) > 127
                    m = m.astype(np.uint8)
                masks.append(m)
        return np.stack(masks) if masks else np.zeros((0, self.h, self.w), np.uint8)

    # ---------------- per-view targets ----------------
    def view_targets(self, view: dict) -> Dict[str, np.ndarray]:
        nq, h, w = self.nq, self.h, self.w
        depth = np.zeros((h, w), np.float32)
        if view.get("depth") is not None:
            # in-memory depth (synthetic fixtures render analytic plane
            # depth, data/synthetic.py; twin of the obs-pickle depth_sensor)
            depth = np.asarray(view["depth"], np.float32)
        kinv = self.default_kinv
        masks = None

        if self.kind == "mp3d":
            obs = self._mp3d_obs(view)
            if obs is not None:
                sem = np.asarray(obs["semantic_sensor"])
                ids = np.unique(sem)
                ids = ids[ids != 0][: nq]
                # NOTE reference parity: masks follow ascending-unique
                # semantic ids while plane params follow annotation order —
                # this sorted-unique <-> annotation pairing is EXACTLY the
                # reference's own assumption (siamese_planeTR.py:488-496,
                # torch.unique over the semantic map zipped against the
                # annotation list); mp3d data satisfies it by construction
                masks = (ids[:, None, None] == sem[None]).astype(np.uint8)
                # depth always loads when present: it supervises BOTH the
                # Q-loss (criterion.py:173-233, independent of DEPTH_ON)
                # and the depth branch
                depth = np.asarray(obs["depth_sensor"], np.float32)
        elif self.kind == "scannet":
            ann = self._scannet_ann(view)
            if ann is not None and len(ann["plane_masks"]) > 0:
                masks = np.stack([np.asarray(m, np.uint8) for m in ann["plane_masks"]])[: nq]
                kinv = np.linalg.inv(
                    np.asarray(ann["camera_K"], np.float64)).astype(np.float32)
                dpath = view["file_name"].replace("color", "depth").replace(".jpg", ".png")
                if os.path.exists(dpath):
                    from PIL import Image

                    depth = np.asarray(Image.open(dpath), np.float32) / 1000.0

        if masks is None:
            masks = self._masks_from_annotations(view)

        n = min(masks.shape[0], nq)
        gt_masks = np.zeros((nq, h, w), np.uint8)
        if masks.shape[1:] != (h, w) and masks.size:
            from PIL import Image

            masks = np.stack([
                np.asarray(Image.fromarray(m * 255).resize((w, h)), np.uint8) > 127
                for m in masks
            ]).astype(np.uint8)
        gt_masks[:n] = masks[:n]
        if n > 1:
            # GT instance masks must be DISJOINT: the Q-loss segmap rewrite
            # (losses/criterion.py:_q_loss_segmap) and the evaluator's seg
            # maps sum per-pixel plane params assuming one plane per pixel.
            # mp3d semantic maps / scannet pre-rendered segs are disjoint by
            # construction; polygon/RLE-rasterised annotations can have
            # 1-px overlaps - resolve them deterministically (first
            # annotation wins, matching the semantic-map convention).
            # In-place first-wins sweep: an int cumsum over [n, h, w] was the
            # single hottest op in the whole input pipeline (~40% of mapper
            # time); n-1 passes of uint8 arithmetic are ~30x cheaper.
            claimed = gt_masks[0].copy()
            free = np.empty_like(claimed)
            for i in range(1, n):
                np.subtract(1, claimed, out=free)
                gt_masks[i] *= free
                claimed |= gt_masks[i]
        gt_valid = np.zeros((nq,), bool)
        gt_valid[:n] = True

        planes = [ann["plane"] for ann in view.get("annotations", [])][:n]
        gt_params = np.zeros((nq, 3), np.float32)
        if planes:
            gt_params[: len(planes)] = np.asarray(planes, np.float32)

        # plane centers in normalised xy over each mask (prepare_targets:498-507),
        # via row/col marginal sums: sum(mask * x) == row_marginal . x, so the
        # [n, h, w] float broadcast (two full-image passes per view) collapses
        # to one uint8 reduction + an [n, w] x [w] dot.
        ys = np.arange(h, dtype=np.float32) / h
        xs = np.arange(w, dtype=np.float32) / w
        m8 = gt_masks[:n]
        row = m8.sum(axis=1, dtype=np.float32)  # [n, w] (collapse y)
        col = m8.sum(axis=2, dtype=np.float32)  # [n, h] (collapse x)
        areas = row.sum(axis=1) + 1e-10
        gt_centers = np.zeros((nq, 2), np.float32)
        gt_centers[:n, 0] = row @ xs / areas
        gt_centers[:n, 1] = col @ ys / areas

        if depth.shape != (h, w):
            from PIL import Image

            depth = np.asarray(Image.fromarray(depth).resize((w, h)), np.float32)

        # WIRE FORMAT (data/packing.py): masks bit-packed along W, k_inv 3x3
        # instead of the 3xHxW ray map, pixel-center map rebuilt on device
        # from (gt_masks, gt_centers). This shrinks the collated 480x640/bs=8
        # batch from ~423 MB to ~110 MB - collate memcpy and the host->device
        # transfer were the end-to-end train-step bottleneck.
        out = {
            "gt_valid": gt_valid,
            "gt_params": gt_params,
            "gt_centers": gt_centers,
            "depth": depth,
        }
        if w % 8 == 0:
            out["gt_masks_packed"] = packing.pack_mask_bits_np(gt_masks)
            out["k_inv"] = kinv
        else:
            # odd widths can't bit-pack: classic (unpacked) keys
            out["gt_masks"] = gt_masks
            out["gt_pixel_centers"] = (
                gt_masks.reshape(nq, -1).astype(np.float32).T @ gt_centers
            ).reshape(h, w, 2)
            xy1 = np.stack([
                (np.arange(w, dtype=np.float32) / w * 640.0)[None, :].repeat(h, 0),
                (np.arange(h, dtype=np.float32) / h * 480.0)[:, None].repeat(w, 1),
                np.ones((h, w), np.float32),
            ]).reshape(3, -1)
            out["k_inv_dot_xy1"] = (kinv @ xy1).reshape(3, h, w)
        return out

    # ---------------- full pair ----------------
    def __call__(self, pair: dict, aug_seed: Optional[int] = None) -> Dict:
        # aug_seed: explicit per-sample augmentation seed. Worker-pool
        # mappers are pickled per map call, which would FREEZE self._aug_rng
        # (every batch replaying identical draws); the loader passes a fresh
        # seed per item instead.
        aug_rng = (np.random.default_rng(aug_seed) if aug_seed is not None
                   else self._aug_rng)
        sample: Dict = {"meta": {
            "image_id0": pair["0"]["image_id"],
            "image_id1": pair["1"]["image_id"],
            "file_name0": pair["0"].get("file_name", ""),
            "file_name1": pair["1"].get("file_name", ""),
            "rel_pose": pair.get("rel_pose", None),
            "gt_corrs": pair.get("gt_corrs", None),
        }}
        for i in ("0", "1"):
            view = pair[i]
            fname = view.get("file_name", "")
            if self.kind == "mp3d" and MP3D_PATH_PREFIX in fname:
                fname = fname.replace(MP3D_PATH_PREFIX, self.root_dir)
            if view.get("image") is not None:
                # in-memory image (synthetic fixtures render one per view);
                # resize to the mapper's shape like the file path does.
                # np.array (not asarray): a no-copy view of the stored image
                # would be corrupted by the in-place normalisation below.
                img = np.array(view["image"], np.float32)
                if img.shape[:2] != (self.h, self.w):
                    from PIL import Image

                    img = np.asarray(
                        Image.fromarray(img.astype(np.uint8)).resize(
                            (self.w, self.h)), np.float32)
            elif fname and os.path.exists(fname):
                img = self._read_image(fname)
            else:
                img = np.zeros((self.h, self.w, 3), np.float32)
            if self.augmentation:
                from .augmentation import simclr_augment

                img = simclr_augment(img, aug_rng)
            if self.raw_uint8:
                # source pixels are uint8 (PIL); the consumer normalises
                # on device with the same constants — bit-equal
                sample[f"image{i}"] = img.astype(np.uint8)
            else:
                # in-place normalise (img is always a fresh float32 array
                # here); multiply by the precomputed reciprocal - the
                # elementwise divide was a measurable slice of the per-pair
                # mapping cost
                img -= self.pixel_mean
                img *= self._pixel_inv_std
                sample[f"image{i}"] = img

        if self.is_train or self.eval_gt_box:
            sample["targets0"] = self.view_targets(pair["0"])
            sample["targets1"] = self.view_targets(pair["1"])

        # relative pose, quat sign-canonicalised (process_camera:549-564)
        rel = pair.get("rel_pose")
        if rel is not None:
            rot = np.asarray(rel["rotation"], np.float32)
            # sign canonicalisation skipped when the legacy camera-bin
            # classification path is on (siamese_planeTR.py:556: the bin
            # convention fixes the quat sign)
            if rot[0] < 0 and not self.camera_cls_on:
                rot = -rot
            tran = np.asarray(rel["position"], np.float32)
            sample["gt_pose"] = np.concatenate([tran, rot]).astype(np.float32)
            if self.bins is not None:
                sample["meta"]["tran_cls"] = self.bins.xyz2class(*rel["position"])
                sample["meta"]["rot_cls"] = self.bins.quat2class(*rel["rotation"])
        else:
            sample["gt_pose"] = np.asarray([0, 0, 0, 1, 0, 0, 0], np.float32)

        # gt correspondences, capped at NQ (process_plane_corr_matrix:573-576)
        corr_idx1 = np.zeros((self.nq,), np.int32)
        corr_idx2 = np.zeros((self.nq,), np.int32)
        corr_valid = np.zeros((self.nq,), bool)
        corrs = pair.get("gt_corrs") or []
        kept = [(a, b) for a, b in corrs if a < self.nq and b < self.nq][: self.nq]
        for k, (a, b) in enumerate(kept):
            corr_idx1[k] = a
            corr_idx2[k] = b
            corr_valid[k] = True
        sample["corr_idx1"] = corr_idx1
        sample["corr_idx2"] = corr_idx2
        sample["corr_valid"] = corr_valid
        return sample


def collate(samples) -> Dict:
    """Stack a list of mapper outputs into one batched dict (metas listed)."""
    out: Dict = {"meta": [s["meta"] for s in samples]}

    def stack(key, sub=None):
        if sub is None:
            return np.stack([s[key] for s in samples])
        return np.stack([s[key][sub] for s in samples])

    for key in samples[0]:
        if key == "meta":
            continue
        if key.startswith("targets"):
            out[key] = {k: stack(key, k) for k in samples[0][key]}
        else:
            out[key] = stack(key)
    return out
