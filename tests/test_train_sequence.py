"""train_sequence (scan + summed grad accumulation) must match the
sequential per-frame training loop."""

import numpy as np
import pytest
import jax
import jax.numpy as jnp

from segfusion_tpu.core.database import Database
from segfusion_tpu.core.pipeline import Pipeline
from segfusion_tpu.data.synthetic import Synthetic
from tests.test_pipeline import small_config, _batch


@pytest.mark.slow
def test_train_sequence_matches_loop():
    cfg = small_config()
    data = Synthetic(cfg.DATA)
    db = Database(data, cfg.DATA)
    pipe = Pipeline(cfg)
    params, stats0 = pipe.init_fusion_params(jax.random.PRNGKey(0), 48, 48)
    s = data.scenes[0]
    k = 3
    frames = [pipe._frame_from_batch(_batch(data, i), cfg.DATA.input)
              for i in range(k)]
    rngs = jax.random.split(jax.random.PRNGKey(7), k)

    # sequential reference with summed grads
    db.reset()
    stats = stats0
    grad_sum = jax.tree_util.tree_map(jnp.zeros_like, params)
    loss_sum = 0.0
    vol = db.volumes[s]
    gt = db.scenes_gt[s]
    for i in range(k):
        loss, grads, vol, stats = pipe.step_train_impl(
            params, stats, vol, gt, frames[i], None, rngs[i])
        grad_sum = jax.tree_util.tree_map(jnp.add, grad_sum, grads)
        loss_sum += float(loss)

    # scan path
    db.reset()
    stacked = jax.tree_util.tree_map(lambda *xs: jnp.stack(xs), *frames)
    resets = jnp.zeros((k,), bool)
    loss2, grads2, vol2, stats2 = pipe.train_sequence(
        params, stats0, db.volumes[s], gt, stacked, None, rngs, resets)

    # train_sequence runs the ROW path (slot-layout state + bf16-packed
    # gt target shadow) while the per-frame loop above is the flat scalar
    # path with f32 gt reads: the bf16 gt rounding (~2e-4 absolute on a
    # +-0.1 target) bounds the loss/grad agreement (measured: ~1.1e-3 /
    # ~1.9e-3 after 3 chained frames); the integrated volumes agree to
    # float-summation tolerance.
    assert np.isclose(float(loss2), loss_sum, atol=5e-3)
    for a, b in zip(jax.tree_util.tree_leaves(grads2),
                    jax.tree_util.tree_leaves(grad_sum)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=5e-3)
    np.testing.assert_allclose(np.asarray(vol2.weights),
                               np.asarray(vol.weights), atol=1e-4)
    np.testing.assert_allclose(np.asarray(vol2.num),
                               np.asarray(vol.num), atol=1e-4)
    for a, b in zip(jax.tree_util.tree_leaves(stats2),
                    jax.tree_util.tree_leaves(stats)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-4)


@pytest.mark.slow
def test_train_sequence_row_matches_scalar_path():
    """Row-layout training (step_train_rows_impl) vs the scalar-path
    train_sequence on identical inputs -- the slot machinery must only
    change numerics within the documented 16-bit gather/target
    precision."""
    cfg = small_config()
    data = Synthetic(cfg.DATA)
    db = Database(data, cfg.DATA)
    k = 3
    pipe_rows = Pipeline(cfg)
    assert pipe_rows.row_path
    import copy
    cfg_s = copy.deepcopy(cfg)
    cfg_s.SETTINGS.integration = "scalar"
    pipe_scalar = Pipeline(cfg_s)

    params, stats0 = pipe_rows.init_fusion_params(jax.random.PRNGKey(0),
                                                  48, 48)
    s = data.scenes[0]
    frames = [pipe_rows._frame_from_batch(_batch(data, i), cfg.DATA.input)
              for i in range(k)]
    stacked = jax.tree_util.tree_map(lambda *xs: jnp.stack(xs), *frames)
    rngs = jax.random.split(jax.random.PRNGKey(7), k)
    resets = jnp.asarray([False, True, False])   # mid-chunk reset too

    db.reset()
    la, ga, va, sa = pipe_rows.train_sequence(
        params, stats0, db.volumes[s], db.scenes_gt[s], stacked, None,
        rngs, resets)
    db.reset()
    lb, gb, vb, sb = pipe_scalar.train_sequence(
        params, stats0, db.volumes[s], db.scenes_gt[s], stacked, None,
        rngs, resets)

    assert np.isclose(float(la), float(lb), atol=5e-3)
    for a, b in zip(jax.tree_util.tree_leaves(ga),
                    jax.tree_util.tree_leaves(gb)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=5e-3)
    np.testing.assert_allclose(np.asarray(va.num), np.asarray(vb.num),
                               atol=1e-4)
    np.testing.assert_allclose(np.asarray(va.weights),
                               np.asarray(vb.weights), atol=1e-4)
    for a, b in zip(jax.tree_util.tree_leaves(sa),
                    jax.tree_util.tree_leaves(sb)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-4)


@pytest.mark.slow
def test_train_sequence_reset_flag_resets_volume():
    cfg = small_config()
    data = Synthetic(cfg.DATA)
    db = Database(data, cfg.DATA)
    pipe = Pipeline(cfg)
    params, stats = pipe.init_fusion_params(jax.random.PRNGKey(0), 48, 48)
    s = data.scenes[0]
    frames = [pipe._frame_from_batch(_batch(data, i), cfg.DATA.input)
              for i in range(2)]
    stacked = jax.tree_util.tree_map(lambda *xs: jnp.stack(xs), *frames)
    rngs = jax.random.split(jax.random.PRNGKey(1), 2)

    # pre-populate the volume, then reset before the LAST frame: the final
    # weights must only contain the last frame's contribution
    db.reset()
    _, _, v_ref, _ = pipe.train_sequence(
        params, stats, db.volumes[s], db.scenes_gt[s],
        jax.tree_util.tree_map(lambda x: x[1:], stacked), None, rngs[1:],
        jnp.zeros((1,), bool))
    w_single = float(jnp.sum(v_ref.weights))

    db.reset()
    _, _, v2, _ = pipe.train_sequence(
        params, stats, db.volumes[s], db.scenes_gt[s], stacked, None, rngs,
        jnp.asarray([False, True]))
    assert np.isclose(float(jnp.sum(v2.weights)), w_single, rtol=1e-5)


def test_train_sequence_dirty_carry_bit_identical_with_resets():
    """Carry on vs off through train_sequence with a mid-chunk reset must
    be BIT-identical: _reset_stream zeroes the carried shadow with a
    CLEAN dirty mask (a zero geo state's shadow is all-zero bits), so no
    rebuild may be needed for reset tiles."""
    import copy

    cfg = small_config()
    data = Synthetic(cfg.DATA)
    db = Database(data, cfg.DATA)
    k = 3
    params = stats0 = None
    s = data.scenes[0]

    def run(dirty):
        nonlocal params, stats0
        c = copy.deepcopy(cfg)
        c.SETTINGS.dirty_shadow = "on" if dirty else "off"
        pipe = Pipeline(c)
        assert pipe.dirty_shadow == dirty
        if params is None:
            params, stats0 = pipe.init_fusion_params(
                jax.random.PRNGKey(0), 48, 48)
        frames = [pipe._frame_from_batch(_batch(data, i), c.DATA.input)
                  for i in range(k)]
        stacked = jax.tree_util.tree_map(lambda *xs: jnp.stack(xs), *frames)
        rngs = jax.random.split(jax.random.PRNGKey(7), k)
        resets = jnp.asarray([False, True, False])
        db.reset()
        return pipe.train_sequence(params, stats0, db.volumes[s],
                                   db.scenes_gt[s], stacked, None, rngs,
                                   resets)

    la, ga, va, sa = run(True)
    lb, gb, vb, sb = run(False)
    assert float(la) == float(lb)
    for a, b in zip(jax.tree_util.tree_leaves(ga),
                    jax.tree_util.tree_leaves(gb)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    np.testing.assert_array_equal(np.asarray(va.num), np.asarray(vb.num))
    np.testing.assert_array_equal(np.asarray(va.weights),
                                  np.asarray(vb.weights))
