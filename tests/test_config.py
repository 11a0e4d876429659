import os

import pytest

from nopesac_tpu.config.config import CfgNode, get_cfg

CONFIG_DIR = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "configs")


class TestCfgNode:
    def test_defaults_keys(self):
        cfg = get_cfg()
        assert cfg.MODEL.SEM_SEG_HEAD.NUM_OBJECT_QUERIES == 50
        assert cfg.MODEL.MATCHING_HEAD.OFFSET_MULTIPLIER == 4.0
        assert cfg.TEST.MATCHING_SCORE_THRESHOLD == 0.2
        assert cfg.MODEL.CAMERA_HEAD.INFERENCE_OUT_CAM_TYPE == "soft"

    def test_base_inheritance(self):
        cfg = get_cfg()
        cfg.merge_from_file(os.path.join(CONFIG_DIR, "inference_mp3d.yaml"))
        # from Base.yaml
        assert cfg.SOLVER.CLIP_GRADIENTS.ENABLED is True
        assert cfg.SOLVER.BACKBONE_MULTIPLIER == 0.1
        # from the leaf
        assert cfg.MODEL.CAMERA_ON is True
        assert cfg.MODEL.CAMERA_HEAD.REFINE_ON is True
        assert cfg.DATASETS.TEST == ["mp3d_test"]

    def test_two_level_inheritance(self):
        cfg = get_cfg()
        cfg.merge_from_file(os.path.join(CONFIG_DIR, "train_mp3d_step3.yaml"))
        assert cfg.MODEL.CAMERA_HEAD.REFINE_ON is True  # step3
        assert cfg.MODEL.CAMERA_HEAD.RAND_ON is True  # inherited from step2
        assert cfg.MODEL.LOSS_EMB_ON is True  # step2
        assert cfg.SOLVER.MAX_ITER == 14000  # step3 override
        assert cfg.MODEL.SEM_SEG_HEAD.MASK_WEIGHT == 20.0  # step1

    def test_dotted_overrides(self):
        cfg = get_cfg()
        cfg.merge_from_list(["TEST.EVAL_FULL_SCENE", "True",
                             "SOLVER.BASE_LR", "0.001",
                             "MODEL.SEM_SEG_HEAD.NUM_OBJECT_QUERIES", "25",
                             "DATASETS.TEST", "('scannet_test',)"])
        assert cfg.TEST.EVAL_FULL_SCENE is True
        assert cfg.SOLVER.BASE_LR == 0.001
        assert cfg.MODEL.SEM_SEG_HEAD.NUM_OBJECT_QUERIES == 25
        assert cfg.DATASETS.TEST == ["scannet_test"]

    def test_freeze(self):
        cfg = get_cfg()
        cfg.freeze()
        with pytest.raises(AttributeError):
            cfg.SEED = 1
        cfg.defrost()
        cfg.SEED = 1
        assert cfg.SEED == 1

    def test_dump_roundtrip(self, tmp_path):
        cfg = get_cfg()
        p = tmp_path / "cfg.yaml"
        p.write_text(cfg.dump())
        cfg2 = CfgNode()
        cfg2.merge_from_file(str(p))
        assert cfg2.MODEL.SEM_SEG_HEAD.NUM_OBJECT_QUERIES == 50

    def test_all_shipped_configs_parse(self):
        import glob

        for path in glob.glob(os.path.join(CONFIG_DIR, "*.yaml")):
            cfg = get_cfg()
            cfg.merge_from_file(path)
            cfg.freeze()


class TestInertKeys:
    def test_documented_inert_key_set(self):
        """Exactly one config key is parity-inert by design besides DEBUG_ON:
        PIXEL_CAM_FIX_ON (the reference defines it, config.py:69, and never
        reads it). INFERENCE_SP_TOPCAM_ON is FUNCTIONAL (wired in
        engine/trainer.test); this test pins the documented inert set so a
        silently-unwired key can't reappear without failing review."""
        import inspect

        import nopesac_tpu.config.config as cfgmod
        src = inspect.getsource(cfgmod)
        for needle in ("cam.PIXEL_CAM_FIX_ON = False", "c.DEBUG_ON = False"):
            # each inert key must carry its "parity-inert" doc where defined
            defn = src.index(needle)
            assert "parity-inert" in src[max(0, defn - 400):defn], needle

    def test_bad_dtype_strings_raise(self):
        from nopesac_tpu.engine.trainer import _resolve_dtype_cfg

        with pytest.raises(ValueError, match="BACKBONE_TRAIN_DTYPE"):
            _resolve_dtype_cfg("bf16", "BACKBONE_TRAIN_DTYPE")
        with pytest.raises(ValueError, match="COMPUTE_DTYPE"):
            _resolve_dtype_cfg("fp32", "COMPUTE_DTYPE")
        import jax.numpy as jnp

        assert _resolve_dtype_cfg("bfloat16", "X") == jnp.bfloat16
        assert _resolve_dtype_cfg("float32", "X") == jnp.float32
