"""Optimizer factory: reference optimizer names -> optax transforms.

Covers the reference's 7 torch optimizers (reference utils/setup.py:145-162)
with torch-equivalent semantics (weight decay added to the gradient before
the moment updates, as torch does).
"""

from __future__ import annotations

from typing import Any, Callable, Union

import optax

__all__ = ["get_optimizer"]

ScalarOrSchedule = Union[float, Callable]


def _with_decay(tx: optax.GradientTransformation, weight_decay: float):
    if not weight_decay:
        return tx
    return optax.chain(optax.add_decayed_weights(weight_decay), tx)


def get_optimizer(opt_cfg: Any,
                  learning_rate: ScalarOrSchedule | None = None
                  ) -> optax.GradientTransformation:
    """Build an optax optimizer from the TRAINING.optimizer config section.

    ``learning_rate`` overrides the config lr (pass a schedule to attach the
    scheduler; reference applies schedulers by mutating param-group lrs).
    """
    if opt_cfg is None:
        return optax.sgd(learning_rate or 1e-2)
    name = opt_cfg.get("name", "sgd")
    lr = learning_rate if learning_rate is not None \
        else float(opt_cfg.get("lr", 1e-3))
    wd = float(opt_cfg.get("weight_decay", 0.0) or 0.0)
    momentum = float(opt_cfg.get("momentum", 0.0) or 0.0)
    eps = float(opt_cfg.get("eps", 1e-8) or 1e-8)

    if name == "sgd":
        return _with_decay(optax.sgd(lr, momentum=momentum or None), wd)
    if name == "adam":
        betas = opt_cfg.get("betas", (0.9, 0.999))
        return _with_decay(optax.adam(lr, b1=float(betas[0]),
                                      b2=float(betas[1]), eps=eps), wd)
    if name == "adamax":
        return _with_decay(optax.adamax(lr, eps=eps), wd)
    if name == "adadelta":
        rho = float(opt_cfg.get("rho", 0.9))
        return _with_decay(optax.adadelta(lr, rho=rho, eps=eps), wd)
    if name == "adagrad":
        return _with_decay(optax.adagrad(lr, eps=eps), wd)
    if name == "rmsprop":
        alpha = float(opt_cfg.get("alpha", 0.99))
        return _with_decay(
            optax.rmsprop(lr, decay=alpha, eps=eps, momentum=momentum
                          or None), wd)
    if name == "asgd":
        # torch ASGD ~ SGD with averaging; SGD is the accepted stand-in
        return _with_decay(optax.sgd(lr), wd)
    raise NotImplementedError(f"Optimizer {name} not implemented")
