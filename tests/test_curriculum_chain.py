"""Curriculum chaining: step1 model_final -> step2 MODEL.WEIGHTS -> step3.

The reference trains in stages whose yamls point WEIGHTS at the previous
stage's checkpoint (train_mp3d_step2.yaml / step3.yaml), with each stage
ENABLING new submodules (step1: detection only; step2: + matching/camera;
step3: + refine). This exercises the orbax->MODEL.WEIGHTS cross-stage load:
a partial overlay (new heads keep fresh init) with params AND BN stats
transferred, optimizer state fresh per stage.
"""
import os

import jax
import numpy as np
import pytest

from nopesac_tpu.config.config import get_cfg
from nopesac_tpu.data.synthetic import make_dataset

H, W = 64, 96


def _stage_cfg(out_dir: str, stage: int, weights: str = ""):
    cfg = get_cfg()
    cfg.MODEL.WEIGHTS = weights
    cfg.MODEL.SEM_SEG_HEAD.PARAM_ON = True
    cfg.MODEL.SEM_SEG_HEAD.CENTER_ON = True
    cfg.MODEL.MATCHING_HEAD.SINKHORN_ITERS = 5
    # the curriculum switch ladder (train_mp3d_step{1,2,3}.yaml)
    if stage >= 2:
        cfg.MODEL.EMBEDDING_ON = True
        cfg.MODEL.CAMERA_ON = True
        cfg.MODEL.LOSS_CAMERA_ON = True
        cfg.MODEL.LOSS_EMB_ON = True
        cfg.MODEL.CAMERA_HEAD.NAME = "PlaneCameraHead"
        cfg.MODEL.CAMERA_HEAD.CAM_REC_ON = True
        cfg.MODEL.CAMERA_HEAD.RAND_ON = True
        cfg.MODEL.CAMERA_HEAD.REFINE_ON = stage >= 3
    cfg.SOLVER.IMS_PER_BATCH = 2
    cfg.SOLVER.MAX_ITER = 2
    cfg.SOLVER.CHECKPOINT_PERIOD = 1000
    cfg.TEST.EVAL_PERIOD = 0
    cfg.TEST.PRECISE_BN.ENABLED = False
    cfg.OUTPUT_DIR = out_dir
    cfg.freeze()
    return cfg


@pytest.fixture(scope="module")
def data():
    return make_dataset(n_pairs=4, n_planes=4, h=H, w=W, seed=9)


def _leaf(tree, path):
    for p in path:
        tree = tree[p]
    return np.asarray(tree)


def test_three_stage_chain(tmp_path_factory, data):
    from nopesac_tpu.engine.trainer import Trainer

    tmp = tmp_path_factory.mktemp("curriculum")

    # ---- step1: detection only
    cfg1 = _stage_cfg(str(tmp / "step1"), stage=1)
    t1 = Trainer(cfg1, dataset_list=data, image_hw=(H, W))
    s1 = t1.train(2)
    w1 = os.path.join(cfg1.OUTPUT_DIR, "checkpoints", "model_final")
    assert os.path.exists(w1)
    p1 = jax.device_get(s1.params)
    bs1 = jax.device_get(s1.batch_stats)

    # ---- step2: + matching/camera heads, WEIGHTS <- step1 model_final
    cfg2 = _stage_cfg(str(tmp / "step2"), stage=2, weights=w1)
    t2 = Trainer(cfg2, dataset_list=data, image_hw=(H, W))
    p2 = jax.device_get(t2.state.params)
    bs2 = jax.device_get(t2.state.batch_stats)

    # transferred subtrees match step1's trained values exactly
    probe = ("backbone", "stem_conv1", "kernel")
    np.testing.assert_array_equal(_leaf(p2, probe), _leaf(p1, probe))
    # the whole plane-head subtree too (deep-supervision decoder trained in
    # step1): every leaf must transfer bit-exactly
    ph = next(k for k in p1 if "plane" in k.lower() or "sem" in k.lower())
    np.testing.assert_array_equal(
        np.concatenate([v.ravel() for v in jax.tree_util.tree_leaves(p2[ph])]),
        np.concatenate([v.ravel() for v in jax.tree_util.tree_leaves(p1[ph])]))
    # BN running stats transferred (load-bearing for eval): every top-level
    # subtree stage1 tracked (top_down BN etc. — the frozen backbone BN lives
    # in params) must arrive bit-exact in stage2
    assert jax.tree_util.tree_leaves(bs1), "stage1 tracked no batch stats?"
    for key in bs1:
        np.testing.assert_array_equal(
            np.concatenate([v.ravel() for v in jax.tree_util.tree_leaves(bs2[key])]),
            np.concatenate([v.ravel() for v in jax.tree_util.tree_leaves(bs1[key])]),
            err_msg=f"batch_stats[{key}] not transferred")
    # step2's NEW heads exist and were left fresh (not in step1's ckpt)
    assert "camera_head" in p2 and "camera_head" not in p1
    assert "matching_head" in p2 and "matching_head" not in p1
    # fresh optimizer: step counter restarts
    assert int(t2.state.step) == 0

    s2 = t2.train(2)
    w2 = os.path.join(cfg2.OUTPUT_DIR, "checkpoints", "model_final")
    assert os.path.exists(w2)
    p2f = jax.device_get(s2.params)

    # ---- step3: + refine, WEIGHTS <- step2 model_final
    cfg3 = _stage_cfg(str(tmp / "step3"), stage=3, weights=w2)
    t3 = Trainer(cfg3, dataset_list=data, image_hw=(H, W))
    p3 = jax.device_get(t3.state.params)
    np.testing.assert_array_equal(
        _leaf(p3, ("camera_head", "trans", "kernel")),
        _leaf(p2f, ("camera_head", "trans", "kernel")))
    s3 = t3.train(2)
    assert int(s3.step) == 2

    # step3's metrics carry the refine-branch losses (REFINE_ON switch live)
    import json

    with open(os.path.join(cfg3.OUTPUT_DIR, "metrics.json")) as f:
        rows = [json.loads(line) for line in f if line.strip()]
    assert any("loss_rot_planeSoftReg_initCamRef" in r for r in rows), rows[-1]
    assert all(np.isfinite(r.get("total_loss", 0.0)) for r in rows)
