"""TB scalar writer: TFRecord framing + Event proto encoding.

Validated two ways: our own strict parser (crc checks), and — the real
compatibility bar — tensorboard's own EventAccumulator reading the file.
"""
import numpy as np
import pytest

from nopesac_tpu.utils.tb_writer import TBScalarWriter, read_tfevents


def _write_sample(tmp_path):
    w = TBScalarWriter(str(tmp_path))
    w.add_scalars({"total_loss": 1.5, "loss_ce": 0.25}, step=0)
    w.add_scalars({"total_loss": 0.75}, step=20)
    w.add_scalars({"skip_nan": float("nan"), "keep": 2.0}, step=40)
    w.close()
    return w.path


def test_roundtrip_own_parser(tmp_path):
    path = _write_sample(tmp_path)
    events = read_tfevents(path)
    assert events[0]["file_version"] == "brain.Event:2"
    assert events[1]["step"] == 0
    assert events[1]["scalars"] == {"total_loss": 1.5, "loss_ce": 0.25}
    assert events[2]["step"] == 20
    np.testing.assert_allclose(events[2]["scalars"]["total_loss"], 0.75)
    # NaN scalars are dropped, finite ones in the same call kept
    assert events[3]["scalars"] == {"keep": 2.0}


def test_tensorboard_reads_our_events(tmp_path):
    pytest.importorskip("tensorboard")
    from tensorboard.backend.event_processing import event_accumulator

    _write_sample(tmp_path)
    ea = event_accumulator.EventAccumulator(str(tmp_path))
    ea.Reload()
    tags = set(ea.Tags()["scalars"])
    assert {"total_loss", "loss_ce", "keep"} <= tags
    tl = ea.Scalars("total_loss")
    assert [e.step for e in tl] == [0, 20]
    np.testing.assert_allclose([e.value for e in tl], [1.5, 0.75])


def test_trainer_emits_tfevents(tmp_path):
    """The smoke trainer writes an events file into OUTPUT_DIR with the
    same scalars that land in metrics.json (SURVEY section 5 metrics row)."""
    import glob
    import os

    from nopesac_tpu.config.config import get_cfg
    from nopesac_tpu.data.synthetic import make_dataset
    from nopesac_tpu.engine.trainer import Trainer

    cfg = get_cfg()
    cfg.MODEL.MATCHING_HEAD.SINKHORN_ITERS = 5
    cfg.MODEL.EMBEDDING_ON = False
    cfg.MODEL.CAMERA_ON = False
    cfg.MODEL.LOSS_CAMERA_ON = False
    cfg.MODEL.LOSS_EMB_ON = False
    cfg.SOLVER.IMS_PER_BATCH = 2
    cfg.SOLVER.MAX_ITER = 1
    cfg.TEST.EVAL_PERIOD = 0
    cfg.TEST.PRECISE_BN.ENABLED = False
    cfg.OUTPUT_DIR = str(tmp_path / "out")
    cfg.freeze()
    data = make_dataset(n_pairs=2, n_planes=3, h=96, w=128)
    tr = Trainer(cfg, dataset_list=data, image_hw=(96, 128))
    tr.train()
    files = glob.glob(os.path.join(cfg.OUTPUT_DIR, "events.out.tfevents.*"))
    assert files, os.listdir(cfg.OUTPUT_DIR)
    events = read_tfevents(files[0])
    scalar_events = [e for e in events if e["scalars"]]
    assert scalar_events and "total_loss" in scalar_events[0]["scalars"]
