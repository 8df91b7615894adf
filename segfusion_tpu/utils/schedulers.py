"""LR schedules as optax schedules.

Covers the reference scheduler zoo (reference utils/schedulers.py:4-53 and
the factory at utils/setup.py:165-193): constant, polynomial, multi-step,
step, cosine annealing, exponential, each optionally wrapped with linear /
constant warmup.
"""

from __future__ import annotations

from typing import Any, Callable

import optax

__all__ = ["get_schedule"]


def constant_lr(base_lr: float):
    return lambda step: base_lr


def polynomial_lr(base_lr: float, max_iter: int, gamma: float = 0.9,
                  decay_iter: int = 1):
    """lr = base * (1 - step/max_iter)^gamma
    (reference utils/schedulers.py:12-21)."""
    def sched(step):
        frac = 1.0 - jnp_minimum(step, max_iter) / float(max_iter)
        return base_lr * (frac ** gamma)
    return sched


def jnp_minimum(a, b):
    # works for both python ints and traced values
    try:
        import jax.numpy as jnp
        return jnp.minimum(a, b)
    except Exception:  # pragma: no cover
        return min(a, b)


def warmup_wrap(schedule: Callable, base_lr: float, warmup_iters: int = 100,
                mode: str = "linear", gamma: float = 0.2):
    """Warmup wrapper (reference utils/schedulers.py:31-53)."""
    import jax.numpy as jnp

    def sched(step):
        cold = schedule(step)
        alpha = jnp.clip(step / float(warmup_iters), 0.0, 1.0)
        if mode == "linear":
            factor = gamma * (1 - alpha) + alpha
        elif mode == "constant":
            factor = gamma
        else:
            raise KeyError(f"WarmUp type {mode} not implemented")
        return jnp.where(step < warmup_iters, factor * cold, cold)

    return sched


def get_schedule(base_lr: float, scheduler_cfg: Any) -> Callable:
    """Factory matching reference utils/setup.py:165-193."""
    if scheduler_cfg is None:
        return constant_lr(base_lr)
    cfg = dict(scheduler_cfg)
    name = cfg.pop("name", "constant_lr")

    warmup = None
    if "warmup_iters" in cfg:
        warmup = {
            "warmup_iters": cfg.pop("warmup_iters", 100),
            "mode": cfg.pop("warmup_mode", "linear"),
            "gamma": cfg.pop("warmup_factor", 0.2),
        }

    if name == "constant_lr":
        sched = constant_lr(base_lr)
    elif name == "poly_lr":
        sched = polynomial_lr(base_lr, int(cfg.get("max_iter", 100000)),
                              float(cfg.get("gamma", 0.9)),
                              int(cfg.get("decay_iter", 1)))
    elif name == "multi_step":
        milestones = sorted(int(m) for m in cfg.get("milestones", [30, 80]))
        g = float(cfg.get("gamma", 0.1))
        sched = optax.piecewise_constant_schedule(
            base_lr, {m: g for m in milestones})
    elif name == "step":
        size = int(cfg.get("step_size", 30))
        g = float(cfg.get("gamma", 0.1))
        sched = optax.exponential_decay(base_lr, size, g, staircase=True)
    elif name == "cosine_annealing":
        t_max = int(cfg.get("T_max", 50000))
        eta_min = float(cfg.get("eta_min", 0.0))
        sched = optax.cosine_decay_schedule(base_lr, t_max,
                                            alpha=eta_min / max(base_lr,
                                                                1e-30))
    elif name == "exp_lr":
        g = float(cfg.get("gamma", 0.99))
        sched = optax.exponential_decay(base_lr, 1, g)
    else:
        raise NotImplementedError(f"Scheduler {name} not implemented")

    if warmup:
        sched = warmup_wrap(sched, base_lr, **warmup)
    return sched
