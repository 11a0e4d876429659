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
    # the synthetic fixtures carry an in-memory ndarray depth + rendered image per view
    # (data/synthetic.py) which is not part of the cached_set JSON schema
    data_json = [
        {k: ({vk: vv for vk, vv in v.items() if vk not in ("depth", "image")}
             if k in ("0", "1") else v)
         for k, v in pair.items()}
        for pair in data
    ]
    with open(dsjson, "w") as f:
        json.dump({"categories": [{"name": "plane", "id": 1}], "data": data_json}, f)
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

    def test_cached_camera_branch(self, artifacts, tmp_path):
        """--camera-cached-file decodes kmeans-bin logits as the pose source
        (reference eval.py:119-135 + camera_branch.py:82-117)."""
        import eval as offline_eval
        from nopesac_tpu.data.cam_bins import CameraBins

        pth, cont, dsjson = artifacts
        bins = CameraBins(dataset="mp3d")
        # build a cached-logits file whose argmax bin is the GT pose's bin
        args = make_args(pth, cont, dsjson)
        ev0 = offline_eval.Evaluator(args, dataset="synth")
        keys, tls, rls, gts_t, gts_r = [], [], [], [], []
        for idx in range(len(ev0.rcnn_data)):
            pair = ev0.dataset_dict[ev0.rcnnidx2datasetkey(idx)]
            keys.append(pair["0"]["file_name"] + pair["1"]["file_name"])
            gt = pair["rel_pose"]
            tl = np.zeros(len(bins.trans_centers))
            tl[bins.xyz2class(*gt["position"])] = 1.0
            rl = np.zeros(len(bins.rots_centers))
            rl[bins.quat2class(*gt["rotation"])] = 1.0
            tls.append(tl)
            rls.append(rl)
            gts_t.append(gt["position"])
            gts_r.append(gt["rotation"])
        cam_file = str(tmp_path / "cached_cam.pkl")
        with open(cam_file, "wb") as f:
            pickle.dump({"keys": keys,
                         "logits_sms": {"tran": np.stack(tls), "rot": np.stack(rls)},
                         "gts": {"tran": gts_t, "rot": gts_r}}, f)

        args = make_args(pth, cont, dsjson)
        args.camera_cached_file = cam_file
        ev = offline_eval.Evaluator(args, dataset="synth")
        info = ev.get_camera_info(0, 0, 0)
        assert info["position"].shape == (3,) and info["rotation"].shape == (4,)
        # top-0 decodes the GT pose's bin centre
        gt0 = ev.dataset_dict[ev.rcnnidx2datasetkey(0)]["rel_pose"]
        np.testing.assert_allclose(
            info["position"],
            bins.class2xyz(int(bins.xyz2class(*gt0["position"]))), atol=1e-6)
        # topk == -1 returns the GT pose itself
        gt_info = ev.get_camera_info(0, -1, -1)
        np.testing.assert_allclose(gt_info["position"], gt0["position"], atol=1e-6)

    def test_coco_json_artifact(self, tmp_path):
        """Per-image COCO json dump (detectron2coco.py:7-146 +
        _siamese_to_coco dedup, mp3d_evaluation.py:131-167)."""
        from nopesac_tpu.data.synthetic import make_dataset
        from nopesac_tpu.evaluation.coco_json import write_siamese_coco_json

        data = make_dataset(n_pairs=3, n_planes=4, h=96, w=128, seed=3)
        path = write_siamese_coco_json(data, str(tmp_path), ["plane"])
        with open(path) as f:
            coco = json.load(f)
        assert set(coco) == {"info", "images", "annotations", "categories", "licenses"}
        # 3 pairs x 2 views, all unique image_ids
        assert len(coco["images"]) == 6
        assert len(coco["annotations"]) == 6 * 4
        ann = coco["annotations"][0]
        assert ann["id"] == 1 and ann["area"] > 0
        assert len(ann["bbox"]) == 4 and "plane" in ann
        assert isinstance(ann["segmentation"]["counts"], str)
        # XYXY -> XYWH conversion happened (synthetic uses bbox_mode 0)
        x0, y0, w_, h_ = ann["bbox"]
        assert w_ > 0 and h_ > 0 and w_ < 128 and h_ < 96
        # cached: second call reuses the file
        assert write_siamese_coco_json(data, str(tmp_path), ["plane"]) == path

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
