"""Tracing / profiling / numerical-guard utilities.

The reference has no systematic tracing (SURVEY.md §5: ad-hoc @profile
leftovers, `torch.autograd.set_detect_anomaly(True)` as the only numeric
guard, reference train_fusion.py:17). This build provides:

  * ``StageTimer`` -- per-stage wall-clock accounting for the pipeline loop
    (correctly forcing completion despite async dispatch),
  * ``trace`` -- context manager around jax.profiler for on-demand TPU
    traces,
  * ``nan_guard`` -- checkify-based NaN/Inf detection for any jitted fn
    (the analogue of detect_anomaly, but opt-in and compiled).
"""

from __future__ import annotations

import contextlib
import time
from collections import defaultdict
from typing import Callable, Dict, Optional

import jax
import jax.numpy as jnp

__all__ = ["StageTimer", "trace", "nan_guard"]


class StageTimer:
    """Accumulates per-stage wall time; ``report()`` returns ms averages.

    Usage::

        timer = StageTimer()
        with timer.stage("extract"):
            out = extract(...)
            timer.sync(out)        # force completion before the clock stops
    """

    def __init__(self, enabled: bool = True):
        self.enabled = enabled
        self.totals: Dict[str, float] = defaultdict(float)
        self.counts: Dict[str, int] = defaultdict(int)

    @contextlib.contextmanager
    def stage(self, name: str):
        if not self.enabled:
            yield self
            return
        t0 = time.perf_counter()
        yield self
        self.totals[name] += time.perf_counter() - t0
        self.counts[name] += 1

    @staticmethod
    def sync(tree):
        """Force completion of a pytree of device arrays (a 4-byte scalar
        readback -- reliable even where block_until_ready is not)."""
        leaves = [x for x in jax.tree_util.tree_leaves(tree)
                  if hasattr(x, "dtype")]
        if leaves:
            float(jnp.sum(leaves[0].astype(jnp.float32)))

    def report(self) -> Dict[str, float]:
        return {k: 1e3 * self.totals[k] / max(self.counts[k], 1)
                for k in self.totals}

    def log(self, logger=None):
        rep = self.report()
        msg = " | ".join(f"{k}: {v:.2f} ms" for k, v in
                         sorted(rep.items(), key=lambda kv: -kv[1]))
        (logger.info if logger else print)(f"stage timing: {msg}")


@contextlib.contextmanager
def trace(log_dir: Optional[str]):
    """jax.profiler trace context (view with TensorBoard / xprof). No-op
    when log_dir is falsy."""
    if not log_dir:
        yield
        return
    jax.profiler.start_trace(log_dir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


def nan_guard(fn: Callable, enabled: bool = True) -> Callable:
    """Wrap a jittable fn with checkify NaN/Inf detection. The wrapped fn
    raises on the host when the check trips (compiled-mode analogue of the
    reference's autograd anomaly detection)."""
    if not enabled:
        return fn
    from jax.experimental import checkify

    checked = checkify.checkify(fn, errors=checkify.float_checks)

    def wrapped(*args, **kwargs):
        err, out = checked(*args, **kwargs)
        checkify.check_error(err)
        return out

    return wrapped
