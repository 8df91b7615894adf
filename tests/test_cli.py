"""CLI integration tests: train_fusion / test_fusion end to end on the
synthetic dataset (the reference's evaluation-scripts-as-tests strategy,
SURVEY.md §4, made automatic)."""

import os
import sys

import numpy as np
import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from segfusion_tpu.config import load_config

CFG = os.path.join(os.path.dirname(__file__), "..", "configs", "fusion",
                   "synthetic_small.yaml")
CFG_SEM = os.path.join(os.path.dirname(__file__), "..", "configs", "fusion",
                       "synthetic_semantic.yaml")


@pytest.fixture()
def tmp_workspace(tmp_path):
    return str(tmp_path)


@pytest.mark.slow
def test_train_fusion_cli(tmp_workspace):
    import train_fusion
    config = load_config(CFG)
    config.SETTINGS.experiment_path = tmp_workspace
    config.SETTINGS.eval_freq = 10
    config.TRAINING.n_epochs = 1
    params, batch_stats = train_fusion.train_fusion({"comment": "t"}, config)
    # checkpoints written
    ts = config.TIMESTAMP
    model_dir = os.path.join(tmp_workspace, ts, "model")
    assert os.path.exists(os.path.join(model_dir, "last.ckpt"))
    assert os.path.exists(os.path.join(model_dir, "best.ckpt"))
    # training log exists and mentions the loss
    log = open(os.path.join(tmp_workspace, ts, "logs", "train.log")).read()
    assert "loss" in log


def test_test_fusion_cli(tmp_workspace):
    import test_fusion as test_fusion_cli
    config = load_config(CFG_SEM)
    config.SETTINGS.experiment_path = tmp_workspace
    results = test_fusion_cli.test_fusion(config)
    assert "iou" in results and "mad" in results
    assert np.isfinite(results["mad"])
    ts = config.TIMESTAMP
    out = os.path.join(tmp_workspace, ts, "output")
    files = os.listdir(out)
    # hdf5 volumes + plain & semantic meshes (save_mode: test)
    assert any(f.endswith(".tsdf.hf5") for f in files), files
    assert any(f.endswith(".weights.hf5") for f in files), files
    assert any(f.endswith(".semantics.hf5") for f in files), files
    assert any(f.endswith(".ply") and "semantic" not in f for f in files)
    assert any(f.endswith("_semantic.ply") for f in files), files


@pytest.mark.slow
def test_checkpoint_roundtrip_through_cli(tmp_workspace, tmp_path):
    """best.ckpt from training loads into test_fusion's restore path."""
    import train_fusion
    import test_fusion as test_fusion_cli
    config = load_config(CFG)
    config.SETTINGS.experiment_path = tmp_workspace
    config.SETTINGS.eval_freq = 10
    train_fusion.train_fusion({"comment": ""}, config)
    ckpt = os.path.join(tmp_workspace, config.TIMESTAMP, "model",
                        "best.ckpt")

    config2 = load_config(CFG)
    config2.SETTINGS.experiment_path = str(tmp_path / "test_ws")
    config2.TESTING.fusion_model_path = ckpt
    results = test_fusion_cli.test_fusion(config2)
    assert np.isfinite(results["mse"])


@pytest.mark.slow
def test_train_fusion_resume(tmp_workspace, tmp_path):
    """TRAINING.resume restores params/opt state and continues."""
    import train_fusion
    config = load_config(CFG)
    config.SETTINGS.experiment_path = tmp_workspace
    config.SETTINGS.eval_freq = 10
    config.TRAINING.n_epochs = 1
    train_fusion.train_fusion({"comment": ""}, config)
    last = os.path.join(tmp_workspace, config.TIMESTAMP, "model",
                        "last.ckpt")
    assert os.path.exists(last)

    config2 = load_config(CFG)
    config2.SETTINGS.experiment_path = str(tmp_path / "resumed")
    config2.SETTINGS.eval_freq = 10
    config2.TRAINING.n_epochs = 2       # resume at epoch 1, run one more
    config2.TRAINING.resume = last
    train_fusion.train_fusion({"comment": ""}, config2)
    log = open(os.path.join(str(tmp_path / "resumed"), config2.TIMESTAMP,
                            "logs", "train.log")).read()
    assert "resumed from" in log
    assert "Training epoch 1/2" in log
