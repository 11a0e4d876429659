"""Two real optimizer steps through the Trainer on synthetic data: losses
finite, params actually change, checkpoint save/restore roundtrip."""
import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from nopesac_tpu.config.config import get_cfg
from nopesac_tpu.data.synthetic import make_dataset

H, W = 64, 96  # smallest stride-32-divisible shape: single-core CPU
# execution of the full train step dominates suite time, not coverage


@pytest.fixture(scope="module")
def trainer(tmp_path_factory):
    cfg = get_cfg()
    cfg.MODEL.MATCHING_HEAD.SINKHORN_ITERS = 5
    cfg.MODEL.EMBEDDING_ON = True
    cfg.MODEL.CAMERA_ON = True
    cfg.MODEL.LOSS_CAMERA_ON = True
    cfg.MODEL.LOSS_EMB_ON = True
    cfg.MODEL.CAMERA_HEAD.NAME = "PlaneCameraHead"
    cfg.MODEL.CAMERA_HEAD.REFINE_ON = True
    cfg.MODEL.CAMERA_HEAD.CAM_REC_ON = True
    cfg.MODEL.CAMERA_HEAD.RAND_ON = True
    cfg.MODEL.SEM_SEG_HEAD.PARAM_ON = True
    cfg.MODEL.SEM_SEG_HEAD.CENTER_ON = True
    cfg.SOLVER.IMS_PER_BATCH = 2
    cfg.SOLVER.MAX_ITER = 2
    cfg.SOLVER.CHECKPOINT_PERIOD = 1000
    cfg.TEST.EVAL_PERIOD = 0
    cfg.OUTPUT_DIR = str(tmp_path_factory.mktemp("train_out"))
    cfg.freeze()

    from nopesac_tpu.engine.trainer import Trainer

    data = make_dataset(n_pairs=4, n_planes=4, h=H, w=W, seed=5)
    return Trainer(cfg, dataset_list=data, image_hw=(H, W))


class TestTrainLoop:
    def test_two_steps(self, trainer):
        p0 = jax.tree_util.tree_map(np.asarray, jax.device_get(trainer.state.params))
        state = trainer.train(max_iter=2)
        assert int(state.step) == 2
        p1 = jax.tree_util.tree_map(np.asarray, jax.device_get(state.params))
        # trainable params moved
        delta = float(np.abs(p1["camera_head"]["trans"]["kernel"]
                             - p0["camera_head"]["trans"]["kernel"]).sum())
        assert delta > 0
        # frozen BN stats did not move
        bn0 = p0["backbone"]["stem_bn1"]["mean"]
        bn1 = p1["backbone"]["stem_bn1"]["mean"]
        np.testing.assert_array_equal(bn0, bn1)
        # metrics were logged
        mpath = os.path.join(trainer.cfg.OUTPUT_DIR, "metrics.json")
        assert os.path.exists(mpath)
        # the synthetic fixture renders analytic plane depth, so the Q-loss
        # (point-to-plane depth consistency, criterion.py:173-233) must be
        # live end-to-end, not silently zero
        import json

        with open(mpath) as f:
            rows = [json.loads(line) for line in f if line.strip()]
        assert rows and any(r.get("loss_q", 0.0) > 0.0 for r in rows), \
            f"loss_q dead in metrics: {rows[-1] if rows else None}"
        # model_final checkpoint written
        assert trainer.checkpointer.latest() is not None

    def test_torch_weights_load_params_and_stats(self, trainer, tmp_path):
        """MODEL.WEIGHTS=*.pth flows through import_torch_weights into BOTH
        the params tree and the batch_stats collection (BN running stats are
        load-bearing for eval of trained torch checkpoints)."""
        torch = pytest.importorskip("torch")

        rng = np.random.default_rng(11)
        qe = rng.normal(size=(50, 256)).astype(np.float32)
        c1_mean = rng.normal(size=(256,)).astype(np.float32)
        ckpt = tmp_path / "w.pth"
        torch.save({"model": {
            "sem_seg_head.query_embed.weight": torch.from_numpy(qe),
            "sem_seg_head.top_down.c1_conv.1.running_mean": torch.from_numpy(c1_mean),
        }}, str(ckpt))

        cfg = trainer.cfg.clone()
        cfg.defrost()
        cfg.MODEL.WEIGHTS = str(ckpt)
        cfg.OUTPUT_DIR = str(tmp_path / "out")
        cfg.freeze()
        from nopesac_tpu.engine.trainer import Trainer

        data = make_dataset(n_pairs=2, n_planes=4, h=H, w=W, seed=6)
        t2 = Trainer(cfg, dataset_list=data, image_hw=(H, W))
        got_qe = np.asarray(jax.device_get(
            t2.state.params["plane_head"]["query_embed"]))
        np.testing.assert_allclose(got_qe, qe, atol=1e-6)
        got_mean = np.asarray(jax.device_get(
            t2.state.batch_stats["plane_head"]["top_down"]["c1_conv"]
            ["BatchNorm_0"]["mean"]))
        np.testing.assert_allclose(got_mean, c1_mean, atol=1e-6)

    def test_checkpoint_roundtrip(self, trainer):
        state = trainer.state
        restored = trainer.checkpointer.restore(jax.device_get(state))
        r = jax.tree_util.tree_map(np.asarray, restored.params)
        s = jax.tree_util.tree_map(np.asarray, jax.device_get(state.params))
        np.testing.assert_allclose(
            r["camera_head"]["trans"]["kernel"], s["camera_head"]["trans"]["kernel"])


@pytest.mark.slow
@pytest.mark.parametrize("config,nq", [("train_scannet_step1.yaml", None),
                                       ("train_scannet_step2.yaml", 25)])
def test_shipped_scannet_configs_construct_and_step(config, nq, tmp_path):
    """The shipped ScanNet configs must construct a Trainer and run one
    finite train step — both as shipped (NQ=50) and under a
    NUM_OBJECT_QUERIES CLI override (the round-5 2-process test found the
    init-probe mapper hardcoded 50 query slots, so ANY non-default NQ
    crashed Trainer init, engine/trainer._init_state)."""
    import os

    from nopesac_tpu.config.config import get_cfg
    from nopesac_tpu.data.synthetic import make_dataset
    from nopesac_tpu.engine.trainer import Trainer

    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    cfg = get_cfg()
    cfg.merge_from_file(os.path.join(repo, "configs", config))
    cfg.MODEL.WEIGHTS = ""  # released checkpoints are not on this host
    # the shipped configs name real scannet splits; synthetic records are
    # mp3d-shaped, so point TRAIN at the synthetic split (the mapper kind
    # follows the split name — a scannet mapper on mp3d records raises,
    # which is also how this test caught the producer-hang liveness bug)
    cfg.DATASETS.TRAIN = ("synthetic_train",)
    cfg.DATASETS.TEST = ("synthetic_test",)
    cfg.MODEL.MATCHING_HEAD.SINKHORN_ITERS = 10
    cfg.SOLVER.IMS_PER_BATCH = 2
    cfg.SOLVER.MAX_ITER = 1
    cfg.SOLVER.CHECKPOINT_PERIOD = 100
    cfg.TEST.EVAL_PERIOD = 0
    cfg.TEST.PRECISE_BN.ENABLED = False
    cfg.DATALOADER.NUM_WORKERS = 0
    if nq is not None:
        cfg.merge_from_list(["MODEL.SEM_SEG_HEAD.NUM_OBJECT_QUERIES", str(nq)])
    cfg.OUTPUT_DIR = str(tmp_path / config.replace(".yaml", ""))
    cfg.freeze()
    data = make_dataset(n_pairs=2, n_planes=4, h=96, w=128, seed=13)
    trainer = Trainer(cfg, dataset_list=data, image_hw=(96, 128))
    state = trainer.train()
    assert int(state.step) == 1
