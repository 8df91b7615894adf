"""Scene-parallel fusion on the virtual 8-device CPU mesh: result must match
per-scene sequential fusion exactly."""

import numpy as np
import jax
import jax.numpy as jnp

from segfusion_tpu.core.database import Database
from segfusion_tpu.core.pipeline import Pipeline
from segfusion_tpu.data.synthetic import Synthetic
from segfusion_tpu.parallel.mesh import scene_mesh
from segfusion_tpu.parallel.scene_parallel import (SceneParallelFusion,
                                                   stack_volumes,
                                                   unstack_volumes)
from tests.test_pipeline import small_config, _batch


def test_scene_parallel_matches_sequential():
    cfg = small_config(use_semantics=False, semantics="class8")
    cfg.DATA.semantic_grid = True
    cfg.DATA.n_scenes = 2
    data = Synthetic(cfg.DATA)
    db = Database(data, cfg.DATA)
    pipe = Pipeline(cfg)
    params, stats = pipe.init_fusion_params(jax.random.PRNGKey(0), 48, 48)

    scenes = data.scenes
    n_frames = 3
    streams = []
    for si, s in enumerate(scenes):
        frames = [pipe._frame_from_batch(_batch(data, si * cfg.DATA.n_frames + t),
                                         cfg.DATA.input)
                  for t in range(n_frames)]
        streams.append(frames)

    # sequential reference
    db.reset()
    seq_vols = []
    for si, s in enumerate(scenes):
        v = db.volumes[s]
        for t in range(n_frames):
            v = pipe.step_fuse_impl((params, stats), v, streams[si][t], None)
        seq_vols.append(v)

    # scene-parallel over the 8-device mesh (2 scenes -> sharded axis)
    db.reset()
    mesh = scene_mesh(devices=jax.devices()[:2])
    runner = SceneParallelFusion(pipe, mesh)
    out = runner.run((params, stats), [db.volumes[s] for s in scenes],
                     streams)

    for v_par, v_seq in zip(out, seq_vols):
        np.testing.assert_allclose(np.asarray(v_par.weights),
                                   np.asarray(v_seq.weights), atol=1e-4)
        np.testing.assert_allclose(np.asarray(v_par.num),
                                   np.asarray(v_seq.num), atol=1e-3)
        np.testing.assert_array_equal(np.asarray(v_par.semkey),
                                      np.asarray(v_seq.semkey))


def test_run_sequences_matches_sequential():
    """Vmapped whole-stream fusion (one dispatch for all scenes x frames,
    the multi-scene streaming bench shape) == per-frame sequential."""
    cfg = small_config(use_semantics=False, semantics="class8")
    cfg.DATA.semantic_grid = True
    cfg.DATA.n_scenes = 2
    data = Synthetic(cfg.DATA)
    db = Database(data, cfg.DATA)
    pipe = Pipeline(cfg)
    params, stats = pipe.init_fusion_params(jax.random.PRNGKey(0), 48, 48)

    scenes = data.scenes
    n_frames = 3
    streams = [[pipe._frame_from_batch(
        _batch(data, si * cfg.DATA.n_frames + t), cfg.DATA.input)
        for t in range(n_frames)] for si in range(len(scenes))]

    db.reset()
    seq_vols = []
    for si, s in enumerate(scenes):
        v = db.volumes[s]
        for t in range(n_frames):
            v = pipe.step_fuse_impl((params, stats), v, streams[si][t],
                                    None)
        seq_vols.append(v)

    db.reset()
    mesh = scene_mesh(devices=jax.devices()[:2])
    runner = SceneParallelFusion(pipe, mesh)
    volumes = runner.shard_volumes(
        stack_volumes([db.volumes[s] for s in scenes]))
    frames = jax.tree_util.tree_map(
        lambda *xs: jnp.stack(xs),
        *[jax.tree_util.tree_map(lambda *ys: jnp.stack(ys), *st)
          for st in streams])                       # (S, T, ...)
    out = unstack_volumes(
        runner.run_sequences((params, stats), volumes, frames),
        len(scenes))

    for v_par, v_seq in zip(out, seq_vols):
        np.testing.assert_allclose(np.asarray(v_par.weights),
                                   np.asarray(v_seq.weights), atol=1e-4)
        np.testing.assert_allclose(np.asarray(v_par.num),
                                   np.asarray(v_seq.num), atol=1e-3)
        np.testing.assert_array_equal(np.asarray(v_par.semkey),
                                      np.asarray(v_seq.semkey))


def test_stack_unstack_roundtrip():
    from segfusion_tpu.core.volume import init_scene_volume
    vols = [init_scene_volume((8, 8, 8), np.zeros(3), 0.1) for _ in range(3)]
    stacked = stack_volumes(vols)
    assert stacked.num.shape == (3, 8, 8, 8)
    back = unstack_volumes(stacked, 3)
    assert back[1].num.shape == (8, 8, 8)


def test_fit_mesh_regrows_after_small_batch():
    """A 2-scene batch must not permanently shrink the runner's mesh:
    a following 8-scene batch uses all 8 devices again."""
    from segfusion_tpu.core.volume import init_scene_volume
    from tests.test_pipeline import small_config

    cfg = small_config(use_semantics=False, semantics="class8")
    pipe = Pipeline(cfg)
    sp = SceneParallelFusion(pipe)
    full = sp.mesh.devices.size
    assert full == 8

    sp._fit_mesh(2)
    assert sp.mesh.devices.size == 2
    sp._fit_mesh(8)
    assert sp.mesh.devices.size == 8
    sp._fit_mesh(6)
    assert sp.mesh.devices.size == 6
