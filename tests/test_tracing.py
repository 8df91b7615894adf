"""Tests for tracing utilities, NaN guards, and fuse_sequence equivalence."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from segfusion_tpu.utils.tracing import StageTimer, nan_guard


def test_stage_timer_accumulates():
    t = StageTimer()
    with t.stage("a"):
        x = jnp.ones((64,)) * 2
        t.sync(x)
    with t.stage("a"):
        pass
    rep = t.report()
    assert "a" in rep and rep["a"] >= 0.0
    assert t.counts["a"] == 2


def test_nan_guard_catches_nan():
    def f(x):
        return jnp.log(x)  # nan for negative input

    guarded = nan_guard(jax.jit(f))
    out = guarded(jnp.asarray([1.0, 2.0]))
    assert np.all(np.isfinite(np.asarray(out)))
    with pytest.raises(Exception):
        guarded(jnp.asarray([-1.0]))


def test_nan_guard_disabled_passthrough():
    f = lambda x: x * 2
    assert nan_guard(f, enabled=False) is f


def test_fuse_sequence_matches_per_frame_loop():
    """lax.scan fusion over T frames == T sequential step calls."""
    from tests.test_pipeline import small_config, _batch
    from segfusion_tpu.core.database import Database
    from segfusion_tpu.core.pipeline import Pipeline
    from segfusion_tpu.data.synthetic import Synthetic

    cfg = small_config(use_semantics=False, semantics="class8")
    cfg.DATA.semantic_grid = True
    data = Synthetic(cfg.DATA)
    db = Database(data, cfg.DATA)
    pipe = Pipeline(cfg)
    params, stats = pipe.init_fusion_params(jax.random.PRNGKey(0), 48, 48)
    s = data.scenes[0]

    # per-frame loop
    db.reset()
    for i in range(4):
        pipe.fuse(_batch(data, i), db, params, stats)
    v_loop = db.volumes[s]

    # one scan
    db.reset()
    frames = [pipe._frame_from_batch(_batch(data, i), cfg.DATA.input)
              for i in range(4)]
    stacked = jax.tree_util.tree_map(lambda *xs: jnp.stack(xs), *frames)
    v_scan = pipe.fuse_sequence((params, stats), db.volumes[s], stacked,
                                None)

    np.testing.assert_allclose(np.asarray(v_scan.weights),
                               np.asarray(v_loop.weights), atol=1e-4)
    np.testing.assert_allclose(np.asarray(v_scan.num),
                               np.asarray(v_loop.num), atol=1e-3)
    np.testing.assert_array_equal(np.asarray(v_scan.semkey),
                                  np.asarray(v_loop.semkey))
