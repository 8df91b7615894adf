"""Pipeline tests: shapes, gradient flow, online improvement on a synthetic
scene (the learned path's end-to-end slice)."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from segfusion_tpu.config import Config, _DEFAULTS, _merge_defaults
from segfusion_tpu.core.database import Database
from segfusion_tpu.core.pipeline import Pipeline
from segfusion_tpu.data.synthetic import Synthetic
from segfusion_tpu.utils.metrics import evaluation


def small_config(use_semantics=False, semantics=None, h=48, w=48):
    cfg = _merge_defaults(Config({}), _DEFAULTS)
    cfg.DATA.resx = w
    cfg.DATA.resy = h
    cfg.DATA.input = "tof_depth"
    cfg.DATA.init_value = 0.24
    cfg.DATA.semantics = semantics
    cfg.DATA.semantic_strategy = "gt"
    cfg.DATA.semantic_grid = bool(semantics)
    cfg.DATA.n_frames = 8
    cfg.DATA.voxel_resolution = 0.1
    cfg.DATA.noise_sigma = 0.004
    cfg.DATA.n_classes = 8
    cfg.FUSION_MODEL.n_points = 5
    cfg.FUSION_MODEL.n_tail_points = 4
    cfg.FUSION_MODEL.growth_factor = 2
    cfg.FUSION_MODEL.use_semantics = use_semantics
    cfg.SEMANTIC_2D_MODEL.n_classes = 8
    return cfg


@pytest.fixture(scope="module")
def setup():
    cfg = small_config(use_semantics=False)
    data = Synthetic(cfg.DATA)
    db_cfg = cfg.DATA
    db_cfg.n_classes = 8
    db = Database(data, db_cfg)
    pipe = Pipeline(cfg)
    params, stats = pipe.init_fusion_params(jax.random.PRNGKey(0), 48, 48)
    return cfg, data, db, pipe, params, stats


def _batch(data, i):
    item = data[i]
    return {k: (np.asarray(v)[None] if isinstance(v, np.ndarray) else v)
            for k, v in item.items()} | {"frame_id": [item["frame_id"]]}


def test_fuse_updates_volume(setup):
    cfg, data, db, pipe, params, stats = setup
    db.reset()
    s = data.scenes[0]
    w_before = float(jnp.sum(db.volumes[s].weights))
    pipe.fuse(_batch(data, 0), db, params, stats)
    w_after = float(jnp.sum(db.volumes[s].weights))
    assert w_after > w_before
    assert db.state[s]


def test_fuse_training_produces_grads(setup):
    cfg, data, db, pipe, params, stats = setup
    db.reset()
    loss, grads, new_stats = pipe.fuse_training(
        _batch(data, 1), db, params, stats, rng=jax.random.PRNGKey(1))
    assert np.isfinite(float(loss))
    gnorm = jax.tree_util.tree_reduce(
        lambda a, x: a + float(jnp.sum(jnp.abs(x))), grads, 0.0)
    assert gnorm > 0.0
    # batch stats changed (BN running averages updated in train mode)
    diff = jax.tree_util.tree_map(
        lambda a, b: float(jnp.sum(jnp.abs(a - b))), stats, new_stats)
    assert jax.tree_util.tree_reduce(lambda a, x: a + x, diff, 0.0) > 0.0


def test_online_fusion_improves_volume(setup):
    """Even an untrained tanh net should produce a volume whose observed
    region correlates with gt after several frames better than the empty
    init (weights grow, mad bounded by truncation)."""
    cfg, data, db, pipe, params, stats = setup
    db.reset()
    s = data.scenes[0]
    for i in range(6):
        pipe.fuse(_batch(data, i), db, params, stats)
    w = np.asarray(db.volumes[s].weights)
    assert (w > 0).mean() > 0.01
    est = np.asarray(db.volumes[s].tsdf)
    gt = np.asarray(db.scenes_gt[s])
    m = evaluation(est, gt, w > 0)
    assert m["mad"] < 2 * cfg.DATA.init_value


def test_semantic_fusion_gt_strategy():
    cfg = small_config(use_semantics=True, semantics="class8")
    data = Synthetic(cfg.DATA)
    db_cfg = cfg.DATA
    db = Database(data, db_cfg)
    pipe = Pipeline(cfg)
    params, stats = pipe.init_fusion_params(jax.random.PRNGKey(0), 48, 48)
    s = data.scenes[0]
    for i in range(4):
        pipe.fuse(_batch(data, i), db, params, stats)
    ids = np.asarray(db.volumes[s].semantics)
    scores = np.asarray(db.volumes[s].scores)
    assert ids.max() > 0          # labels were written
    assert scores.max() > 0.99    # gt strategy scores are 1.0
    # labels only appear where geometry was observed
    w = np.asarray(db.volumes[s].weights)
    assert ((ids > 0) & (w == 0)).mean() < 0.05
    # fused labels roughly agree with the gt label volume where observed
    gt_ids = db.ids_gt[s]
    m = (w > 0) & (gt_ids > 0) & (ids > 0)
    if m.sum() > 100:
        agree = (ids[m] == gt_ids[m]).mean()
        assert agree > 0.5


def test_training_reduces_loss():
    """A few optimizer steps on repeated frames should reduce the fusion
    loss -- checks the full grad path end to end."""
    import optax
    cfg = small_config()
    data = Synthetic(cfg.DATA)
    db = Database(data, cfg.DATA)
    pipe = Pipeline(cfg)
    params, stats = pipe.init_fusion_params(jax.random.PRNGKey(0), 48, 48)
    opt = optax.adam(1e-3)
    opt_state = opt.init(params)

    losses = []
    for it in range(8):
        db.reset()
        loss, grads, stats = pipe.fuse_training(
            _batch(data, 0), db, params, stats,
            rng=jax.random.PRNGKey(it))
        updates, opt_state = opt.update(grads, opt_state, params)
        params = optax.apply_updates(params, updates)
        losses.append(float(loss))
    assert losses[-1] < losses[0], losses
