"""Spatially-sharded fusion must be numerically identical to unsharded
(XLA SPMD partitions the gathers/scatters across the x axis)."""

import numpy as np
import jax
import jax.numpy as jnp

from segfusion_tpu.core.database import Database
from segfusion_tpu.core.pipeline import Pipeline
from segfusion_tpu.data.synthetic import Synthetic
from segfusion_tpu.parallel.mesh import scene_mesh
from segfusion_tpu.parallel.spatial import (SpatialShardedFusion,
                                            shard_volume_spatial)
from tests.test_pipeline import small_config, _batch


def test_spatial_sharded_step_matches_unsharded():
    cfg = small_config(use_semantics=False, semantics="class8")
    cfg.DATA.semantic_grid = True
    cfg.DATA.pad_shape_multiple = 8  # make x divisible by the mesh
    data = Synthetic(cfg.DATA)
    db = Database(data, cfg.DATA)
    pipe = Pipeline(cfg)
    params, stats = pipe.init_fusion_params(jax.random.PRNGKey(0), 48, 48)
    s = data.scenes[0]
    frames = [pipe._frame_from_batch(_batch(data, i), cfg.DATA.input)
              for i in range(3)]

    # unsharded reference
    db.reset()
    v_ref = db.volumes[s]
    for f in frames:
        v_ref = pipe.step_fuse_impl((params, stats), v_ref, f, None)

    # sharded over 8 virtual devices along x
    db.reset()
    mesh = scene_mesh("x", devices=jax.devices()[:8])
    runner = SpatialShardedFusion(pipe, mesh)
    v = runner.shard(db.volumes[s])
    assert v.num.sharding.spec == jax.sharding.PartitionSpec("x", None,
                                                             None)
    for f in frames:
        v = runner.step((params, stats), v, f)

    np.testing.assert_allclose(np.asarray(v.weights),
                               np.asarray(v_ref.weights), atol=1e-4)
    np.testing.assert_allclose(np.asarray(v.num), np.asarray(v_ref.num),
                               atol=1e-3)
    np.testing.assert_array_equal(np.asarray(v.semkey),
                                  np.asarray(v_ref.semkey))


def test_spatial_sharded_step_composes_with_fused_net():
    """Folded matmul-executor weights (prepare_params) through the
    spatially-sharded step: SPMD partitions the volume ops, the net
    matmuls replicate -- results match the unsharded fused step."""
    cfg = small_config(use_semantics=False, semantics=None)
    cfg.DATA.pad_shape_multiple = 8
    cfg.SETTINGS.fused_net = "on"
    data = Synthetic(cfg.DATA)
    db = Database(data, cfg.DATA)
    pipe = Pipeline(cfg)
    assert pipe.fused_net
    params, stats = pipe.init_fusion_params(jax.random.PRNGKey(0), 48, 48)
    prepped = pipe.prepare_params(params, stats)
    assert "meta" in prepped[0]
    s = data.scenes[0]
    frames = [pipe._frame_from_batch(_batch(data, i), cfg.DATA.input)
              for i in range(2)]

    db.reset()
    v_ref = db.volumes[s]
    for f in frames:
        v_ref = pipe.step_fuse_impl(prepped, v_ref, f, None)

    db.reset()
    mesh = scene_mesh("x", devices=jax.devices()[:8])
    runner = SpatialShardedFusion(pipe, mesh)
    v = runner.shard(db.volumes[s])
    for f in frames:
        v = runner.step(prepped, v, f)

    np.testing.assert_allclose(np.asarray(v.weights),
                               np.asarray(v_ref.weights), atol=1e-4)
    np.testing.assert_allclose(np.asarray(v.num), np.asarray(v_ref.num),
                               atol=1e-3)


def test_shard_volume_requires_divisible_x():
    import pytest
    from segfusion_tpu.core.volume import init_scene_volume
    mesh = scene_mesh("x", devices=jax.devices()[:8])
    v = init_scene_volume((10, 8, 8), np.zeros(3), 0.1)
    with pytest.raises(ValueError):
        shard_volume_spatial(v, mesh)
