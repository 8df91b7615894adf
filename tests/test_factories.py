"""Factory tests: optimizers, schedulers, losses, config defaults."""

import numpy as np
import jax
import jax.numpy as jnp
import optax
import pytest

from segfusion_tpu.config import Config, load_config, get_data_config
from segfusion_tpu.utils.losses import get_loss_function
from segfusion_tpu.utils.optim import get_optimizer
from segfusion_tpu.utils.schedulers import get_schedule


@pytest.mark.parametrize("name", ["sgd", "adam", "adamax", "adadelta",
                                  "adagrad", "rmsprop", "asgd"])
def test_optimizer_factory(name):
    cfg = Config({"name": name, "lr": 1e-3, "momentum": 0.9,
                  "weight_decay": 0.01, "eps": 1e-9})
    tx = get_optimizer(cfg)
    params = {"w": jnp.ones((4,))}
    state = tx.init(params)
    grads = {"w": jnp.ones((4,)) * 0.1}
    updates, _ = tx.update(grads, state, params)
    assert np.all(np.isfinite(np.asarray(updates["w"])))


def test_poly_schedule_decays():
    s = get_schedule(1e-2, Config({"name": "poly_lr", "max_iter": 100}))
    assert float(s(0)) == pytest.approx(1e-2)
    assert float(s(50)) < 1e-2
    assert float(s(100)) == pytest.approx(0.0, abs=1e-9)


def test_warmup_schedule():
    s = get_schedule(1.0, Config({"name": "constant_lr",
                                  "warmup_iters": 10,
                                  "warmup_factor": 0.1}))
    assert float(s(0)) == pytest.approx(0.1)
    assert float(s(5)) == pytest.approx(0.55)
    assert float(s(20)) == pytest.approx(1.0)


@pytest.mark.parametrize("name", ["constant_lr", "multi_step", "step",
                                  "cosine_annealing", "exp_lr"])
def test_all_schedulers_finite(name):
    s = get_schedule(1e-3, Config({"name": name, "max_iter": 100,
                                   "T_max": 100}))
    for step in (0, 10, 99):
        assert np.isfinite(float(s(step)))


def test_loss_factory_names():
    for name in ("fusion", "cross_entropy", "bootstrapped_cross_entropy",
                 "multi_scale_cross_entropy"):
        fn = get_loss_function(Config({"name": name, "min_K": 16,
                                       "loss_th": 0.3}))
        assert callable(fn)
    with pytest.raises(NotImplementedError):
        get_loss_function(Config({"name": "nope"}))


def test_config_defaults_and_modes(tmp_path):
    p = tmp_path / "c.yaml"
    p.write_text("DATA:\n  dataset: Synthetic\n  resx: 32\n  resy: 32\n"
                 "  train_scene_list: train.txt\n")
    cfg = load_config(str(p))
    assert cfg.FUSION_MODEL.n_points == 9          # defaults merged
    assert cfg.TRAINING.optimizer.name == "rmsprop"
    d = get_data_config(cfg, "train")
    assert d.scene_list == "train.txt"
    assert d.mode == "train"
    with pytest.raises(ValueError):
        get_data_config(cfg, "bogus")


def test_orbax_checkpoint_roundtrip(tmp_path):
    from segfusion_tpu.utils.checkpoints import (load_checkpoint_orbax,
                                                 save_checkpoint_orbax)
    state = {"params": {"w": jnp.arange(4.0)}, "epoch": 3}
    p = str(tmp_path / "ck_orbax")
    save_checkpoint_orbax(state, p)
    out = load_checkpoint_orbax(p)
    assert int(out["epoch"]) == 3
    np.testing.assert_allclose(np.asarray(out["params"]["w"]),
                               np.arange(4.0))
