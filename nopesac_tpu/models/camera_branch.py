"""Legacy camera branch: GT / cached SparsePlanes camera logits -> pose.

Spec: modeling/meta_arch/camera_branch.py:7-133 (Camera_Branch). Used by the
offline eval as an optional fallback when no regressed camera is available
(eval.py:119): decodes top-k kmeans-bin class logits into (position,
rotation) via the extracted cluster centres.
"""
from __future__ import annotations

import pickle
from typing import List, Optional

import numpy as np

from ..data.cam_bins import CameraBins


def _softmax(x):
    x = np.asarray(x, np.float64)
    e = np.exp(x - x.max())
    return e / e.sum()


class CameraBranch:
    def __init__(self, cfg=None, dataset: str = "mp3d",
                 cached_logits_path: Optional[str] = None):
        self.mode = "CACHED"
        if cfg is not None:
            self.mode = cfg.MODEL.CAMERA_BRANCH
            dataset = "scannet" if "scannet" in str(cfg.DATASETS.TEST) else "mp3d"
        self.bins = CameraBins(dataset=dataset)
        self.cached = None
        self._key_index = None
        if cached_logits_path:
            with open(cached_logits_path, "rb") as f:
                self.cached = pickle.load(f)
            # key -> row index, built once: per-pair list(...).index() was
            # O(N^2) over a ~13k-pair test split
            self._key_index = {k: i for i, k in enumerate(self.cached["keys"])}

    def xyz2class(self, x, y, z):
        return self.bins.xyz2class(x, y, z)

    def quat2class(self, w, xi, yi, zi):
        return self.bins.quat2class(w, xi, yi, zi)

    def class2xyz(self, cls):
        return self.bins.class2xyz(cls)

    def class2quat(self, cls):
        return self.bins.class2quat(cls)

    def cached_rel_camera(self, pair_dicts: List[dict], tran_topk: int = 0,
                          rot_topk: int = 0) -> List[dict]:
        """Decode the SparsePlanes cached-logits file for these pairs
        (camera_branch.py:82-117: key = file_name0 + file_name1, fields
        `keys`, `logits_sms` {tran, rot}, `gts` {tran, rot}).
        topk == -1 selects the cached GT pose."""
        assert self.cached is not None, "no --camera-cached-file loaded"
        out = []
        for pair in pair_dicts:
            key = pair["0"].get("file_name", "") + pair["1"].get("file_name", "")
            idx = self._key_index.get(key)
            if idx is None:
                raise KeyError(
                    f"pair {key!r} not present in the cached camera logits file")
            tl = np.asarray(self.cached["logits_sms"]["tran"][idx])
            rl = np.asarray(self.cached["logits_sms"]["rot"][idx])
            if tran_topk == -1:
                tran, tran_p = np.asarray(self.cached["gts"]["tran"][idx]), 1.0
            else:
                ti = int(np.argsort(tl)[::-1][tran_topk])
                tran, tran_p = self.class2xyz(ti), float(tl[ti])
            if rot_topk == -1:
                rot, rot_p = np.asarray(self.cached["gts"]["rot"][idx]), 1.0
            else:
                ri = int(np.argsort(rl)[::-1][rot_topk])
                rot, rot_p = self.class2quat(ri), float(rl[ri])
            out.append({"position": np.asarray(tran).reshape(3),
                        "position_prob": tran_p,
                        "rotation": np.asarray(rot).reshape(4),
                        "rotation_prob": rot_p})
        return out

    def get_rel_camera(self, pred_dicts: List[dict], tran_topk: int = 0,
                       rot_topk: int = 0) -> List[dict]:
        """Decode top-k binned camera for each prediction
        (camera_branch.py:82-115). topk == -1 means use the GT pose."""
        out = []
        for pred in pred_dicts:
            cam = pred["camera"]
            # each -1 independently selects the GT field (reference
            # camera_branch.py:91-107) — a mixed call like
            # (tran_topk=-1, rot_topk=0) is a legitimate ablation
            if tran_topk == -1:
                tran, tran_p = np.asarray(cam["gts"]["tran"]), 1.0
            else:
                tl = np.asarray(cam["logits"]["tran"])
                ti = int(np.argsort(tl)[::-1][tran_topk])
                tran, tran_p = self.class2xyz(ti), float(_softmax(tl)[ti])
            if rot_topk == -1:
                rot, rot_p = np.asarray(cam["gts"]["rot"]), 1.0
            else:
                rl = np.asarray(cam["logits"]["rot"])
                ri = int(np.argsort(rl)[::-1][rot_topk])
                rot, rot_p = self.class2quat(ri), float(_softmax(rl)[ri])
            out.append({
                "position": tran,
                "rotation": rot,
                "position_prob": tran_p,
                "rotation_prob": rot_p,
            })
        return out
