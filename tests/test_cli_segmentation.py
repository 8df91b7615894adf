"""Segmentation CLI integration tests on the synthetic dataset."""

import os
import sys

import numpy as np
import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from segfusion_tpu.config import load_config

CFG = os.path.join(os.path.dirname(__file__), "..", "configs",
                   "segmentation", "synthetic_small.yaml")


@pytest.mark.slow
def test_train_and_test_segmentation_cli(tmp_path):
    import train_segmentation
    config = load_config(CFG)
    config.SETTINGS.experiment_path = str(tmp_path / "seg")
    config.TRAINING.n_epochs = 1
    params, batch_stats = train_segmentation.train({"comment": ""}, config)
    model_dir = os.path.join(str(tmp_path / "seg"), config.TIMESTAMP,
                             "model")
    assert os.path.exists(os.path.join(model_dir, "last.ckpt"))
    assert os.path.exists(os.path.join(model_dir, "best.ckpt"))

    import test_segmentation
    config2 = load_config(CFG)
    config2.SETTINGS.experiment_path = str(tmp_path / "seg_test")
    config2.TESTING.semantic_2d_model_path = os.path.join(model_dir,
                                                          "best.ckpt")
    metrics = test_segmentation.test(config2)
    assert "Mean IoU" in metrics
    assert np.isfinite(metrics["Acc"])
    # visualization strips written
    vis = os.path.join(str(tmp_path / "seg_test"), config2.TIMESTAMP,
                       "output", "vis")
    assert len(os.listdir(vis)) > 0
