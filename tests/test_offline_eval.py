"""Offline eval.py contract test: artifacts from the online evaluator are
consumed by the offline Evaluator (camera / matching / AP paths)."""
import json
import os
import pickle
import sys
import types

import numpy as np
import pytest

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, ROOT)


def make_fake_artifacts(tmp_path, n_pairs=2):
    """Build a small prediction set directly (no model) in the exact artifact
    format, derived from synthetic GT so metrics are perfect."""
    from nopesac_tpu.data.synthetic import make_dataset
    from nopesac_tpu.utils import rle as rle_util

    h, w = 96, 128
    data = make_dataset(n_pairs=n_pairs, n_planes=4, h=h, w=w, seed=7)
    predictions = []
    optimized = {}
    for idx, pair in enumerate(data):
        pred = {"0": {}, "1": {}}
        for i in ("0", "1"):
            view = pair[i]
            insts = []
            planes = []
            for ann in view["annotations"]:
                insts.append({
                    "image_id": view["image_id"],
                    "file_name": view["file_name"],
                    "category_id": 0,
                    "score": 0.95,
                    "segmentation": dict(ann["segmentation"]),
                    "bbox": ann["bbox"],
                    "bbox_mode": 1,
                })
                planes.append(ann["plane"])
            pred[i] = {
                "image_id": view["image_id"],
                "file_name": view["file_name"],
                "instances": insts,
                "pred_plane": np.asarray(planes, np.float32),
            }
        n = len(pair["0"]["annotations"])
        assignment = np.eye(n, dtype=np.float32)
        gt_cam = {
            "tran": pair["rel_pose"]["position"],
            "rot": pair["rel_pose"]["rotation"],
        }
        pred["camera"] = {
            "pred": {"tran": np.asarray(gt_cam["tran"]), "rot": np.asarray(gt_cam["rot"])},
            "gts": gt_cam,
        }
        pred["pred_assignment"] = assignment
        predictions.append(pred)
        optimized[idx] = {
            "n_corr": assignment.sum(),
            "cost": 0.1,
            "best_camera": {
                "position": np.asarray(gt_cam["tran"]),
                "rotation": np.asarray(gt_cam["rot"]),
            },
            "gt_camera": {
                "position": np.asarray(gt_cam["tran"]),
                "rotation": np.asarray(gt_cam["rot"]),
            },
            "best_assignment": assignment,
            "plane_param_override": {
                "0": np.asarray([a["plane"] for a in pair["0"]["annotations"]]),
                "1": np.asarray([a["plane"] for a in pair["1"]["annotations"]]),
            },
            "image_ids": {"0": pair["0"]["image_id"], "1": pair["1"]["image_id"]},
        }

    import torch

    pth = str(tmp_path / "NopeSAC_instances_predictions.pth")
    torch.save(predictions, pth)
    cont = str(tmp_path / "continuous.pkl")
    with open(cont, "wb") as f:
        pickle.dump(optimized, f)
    dsjson = str(tmp_path / "cached_set_synth.json")
    with open(dsjson, "w") as f:
        json.dump({"categories": [{"name": "plane", "id": 1}], "data": data}, f)
    return pth, cont, dsjson


@pytest.fixture(scope="module")
def artifacts(tmp_path_factory):
    return make_fake_artifacts(tmp_path_factory.mktemp("offline"))


def make_args(pth, cont, dsjson):
    return types.SimpleNamespace(
        config_file="", rcnn_cached_file=pth, evaluate="AP", num_process=1,
        camera_cached_file="", num_data=-1, dataset_phase="synth",
        optimized_dict_path=cont, dataset_json=dsjson, opts=[],
    )


class TestOfflineEval:
    def test_camera_perfect(self, artifacts):
        import eval as offline_eval

        pth, cont, dsjson = artifacts
        ev = offline_eval.Evaluator(make_args(pth, cont, dsjson), dataset="synth")
        with open(cont, "rb") as f:
            ev.optimized_dict = pickle.load(f)
        out = ev.evaluate_camera(ev.optimized_dict)
        assert out["median_tran_err"] < 1e-6
        assert out["median_rot_err"] < 1e-3

    def test_matching_perfect(self, artifacts):
        import eval as offline_eval

        pth, cont, dsjson = artifacts
        ev = offline_eval.Evaluator(make_args(pth, cont, dsjson), dataset="synth")
        with open(cont, "rb") as f:
            ev.optimized_dict = pickle.load(f)
        m = ev.evaluate_matching_precision_recall()
        assert m["precision"] == 1.0
        assert m["recall"] == 1.0

    def test_ap_perfect(self, artifacts):
        import eval as offline_eval

        pth, cont, dsjson = artifacts
        ev = offline_eval.Evaluator(make_args(pth, cont, dsjson), dataset="synth")
        with open(cont, "rb") as f:
            ev.optimized_dict = pickle.load(f)
        idxs = list(range(len(ev.rcnn_data)))
        err = offline_eval.multiprocess_by_list(ev, 1, idxs)
        stats = [offline_eval.evaluate_by_idx(err[i]) for i in idxs]
        bb = list(zip(*stats))
        aps = {}
        for i, name in enumerate(offline_eval.EP_AP_STR):
            tp, fp, sc, num_inst, *_ = zip(*bb[i])
            ap, rec, prec, npos = offline_eval.inst_bench(tp, fp, sc, num_inst)
            aps[name] = ap
        # predictions == GT (matched pairs merged identically) -> AP 1.0
        for name, ap in aps.items():
            assert ap > 0.99, (name, ap)
