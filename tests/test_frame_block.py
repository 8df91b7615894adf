"""Frame-block integration (SETTINGS.frame_block = k): sequence scans
process k frames per scan step against the same pre-block state and pay
the scatters/shadow-rebuild once per block (PERFORMANCE.md "scatter cost
model").

Correctness contract tested here:
  (a) when the frames within each block have DISJOINT volume footprints,
      blocked == sequential BITWISE (frame i's extraction never reads
      rows frames 0..i-1 of its block wrote, and the scatters are exact
      commutative sums/maxes of per-frame updates);
  (b) tail padding (T % k != 0) is a no-op (all-masked pad frames);
  (c) for OVERLAPPING frames the weight volume still matches the
      sequential run to float re-association (weights are pure ray
      geometry, independent of the staleness approximation) and the
      semantic key volume matches exactly (winner-takes-max is
      order-independent and scores depend only on the frame);
  (d) the block path composes under scene-parallel vmap.
"""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from segfusion_tpu.config import Config, _DEFAULTS, _merge_defaults
from segfusion_tpu.core.pipeline import Pipeline
from segfusion_tpu.core.volume import init_scene_volume
from segfusion_tpu.ops import geometry, rowvol

H = W = 24
N_POINTS = 5


def _config(frame_block=1, semantics=True):
    cfg = _merge_defaults(Config({}), _DEFAULTS)
    cfg.DATA.resx = W
    cfg.DATA.resy = H
    cfg.DATA.init_value = 0.1
    if semantics:
        cfg.DATA.semantics = "class6"
        cfg.DATA.semantic_strategy = "gt"
        cfg.SEMANTIC_2D_MODEL.n_classes = 6
    cfg.FUSION_MODEL.name = "v3"
    cfg.FUSION_MODEL.n_points = N_POINTS
    cfg.FUSION_MODEL.n_tail_points = 4
    cfg.FUSION_MODEL.growth_factor = 2
    cfg.FUSION_MODEL.use_semantics = False
    cfg.SETTINGS.frame_block = frame_block
    return cfg


def _vol():
    return init_scene_volume((32, 32, 32),
                             np.array([-1.6, -1.6, -1.6], np.float32),
                             0.1, 0.1)


def _cam_frames(x_offsets, seed=0):
    """One frame per x_offset: a narrow-FOV camera at (x, 0, -1.5)
    looking +z -- far-apart offsets give disjoint sample footprints."""
    rng = np.random.RandomState(seed)
    T = len(x_offsets)
    depth = 1.2 + 0.1 * rng.rand(T, H, W).astype(np.float32)
    depth[:, :2, :2] = 0.0                      # some masked rays
    poses = np.tile(np.eye(4, dtype=np.float32), (T, 1, 1))
    poses[:, 0, 3] = np.asarray(x_offsets, np.float32)
    poses[:, 2, 3] = -1.5
    f = 2.0 * W                                 # ~14 deg half-angle
    intr = np.array([[f, 0, W / 2], [0, f, H / 2], [0, 0, 1]], np.float32)
    sem = rng.randint(0, 6, (T, H, W)).astype(np.uint8)
    return {
        "depth": jnp.asarray(depth),
        "extrinsics": jnp.asarray(poses),
        "intrinsics": jnp.broadcast_to(jnp.asarray(intr), (T, 3, 3)),
        "mask": jnp.asarray(depth > 0),
        "semantic_gt": jnp.asarray(sem),
    }


def _footprint_rows(frames, i, volume, n_points):
    """The geo slot rows frame i's integration can touch."""
    frame = jax.tree_util.tree_map(lambda x: x[i], frames)
    layout = rowvol.RowLayout.for_shape(tuple(volume.num.shape))
    pw = geometry.unproject(frame["depth"], frame["extrinsics"],
                            frame["intrinsics"])
    eye = frame["extrinsics"][:3, 3].astype(jnp.float32)
    pv, _ = geometry.sample_ray_points(pw, eye, volume.origin,
                                       volume.resolution, n_points)
    cr = rowvol.corner_rows(pv, layout)
    return np.unique(np.asarray(cr.sg_rows))


def _run(cfg, frames, seed=0):
    pipe = Pipeline(cfg)
    params, stats = pipe.init_fusion_params(jax.random.PRNGKey(seed), H, W)
    vol = _vol()
    out = pipe.fuse_sequence((params, stats), vol, frames, None)
    return out


def test_disjoint_blocks_bitexact():
    """Blocks of 2 frames with disjoint footprints == per-frame run,
    bitwise, for num / weights / semkey."""
    frames = _cam_frames([-0.8, 0.8, -0.8, 0.8])
    vol = _vol()
    rA = _footprint_rows(frames, 0, vol, N_POINTS)
    rB = _footprint_rows(frames, 1, vol, N_POINTS)
    assert np.intersect1d(rA, rB).size == 0, \
        "test geometry broken: in-block footprints overlap"

    seq = _run(_config(frame_block=1), frames)
    blk = _run(_config(frame_block=2), frames)
    np.testing.assert_array_equal(np.asarray(seq.num), np.asarray(blk.num))
    np.testing.assert_array_equal(np.asarray(seq.weights),
                                  np.asarray(blk.weights))
    np.testing.assert_array_equal(np.asarray(seq.semkey),
                                  np.asarray(blk.semkey))
    assert float(jnp.sum(seq.weights)) > 0.0


def test_tail_padding_noop():
    """T=3 with k=2 (one all-masked pad frame) == sequential T=3."""
    frames = _cam_frames([-0.8, 0.8, -0.8])
    seq = _run(_config(frame_block=1), frames)
    blk = _run(_config(frame_block=2), frames)
    np.testing.assert_array_equal(np.asarray(seq.num), np.asarray(blk.num))
    np.testing.assert_array_equal(np.asarray(seq.weights),
                                  np.asarray(blk.weights))
    np.testing.assert_array_equal(np.asarray(seq.semkey),
                                  np.asarray(blk.semkey))


def test_overlapping_weights_and_keys():
    """Same-camera frames (maximal overlap): the weight volume matches
    sequential to re-association tolerance; the key volume exactly."""
    frames = _cam_frames([0.0, 0.0, 0.0, 0.0])
    seq = _run(_config(frame_block=1), frames)
    blk = _run(_config(frame_block=4), frames)
    np.testing.assert_allclose(np.asarray(seq.weights),
                               np.asarray(blk.weights),
                               rtol=1e-5, atol=1e-5)
    np.testing.assert_array_equal(np.asarray(seq.semkey),
                                  np.asarray(blk.semkey))
    # num differs (frame i>0 fuses pre-block values) but must stay
    # bounded by the same truncation band and finite
    num = np.asarray(blk.num)
    assert np.isfinite(num).all()
    w = np.asarray(blk.weights)
    tsdf = num[w > 0] / w[w > 0]
    assert np.abs(tsdf).max() <= 0.1 + 1e-5


def test_scene_parallel_vmap_composes():
    """The block scan path works under the scene axis vmap (multi512)."""
    from segfusion_tpu.parallel.scene_parallel import (SceneParallelFusion,
                                                       stack_volumes)
    cfg = _config(frame_block=2)
    pipe = Pipeline(cfg)
    params, stats = pipe.init_fusion_params(jax.random.PRNGKey(0), H, W)
    runner = SceneParallelFusion(pipe)
    frames = _cam_frames([-0.8, 0.8, -0.8, 0.8])
    stacked_frames = jax.tree_util.tree_map(
        lambda x: jnp.stack([x, x]), frames)
    vols = runner.shard_volumes(stack_volumes([_vol(), _vol()]))
    out = runner.run_sequences((params, stats), vols, stacked_frames, None)
    ref = _run(cfg, frames)
    for i in range(2):
        # float tolerance: XLA's batched scatter lowering re-associates
        # (same convention as tests/test_scene_parallel.py); keys exact
        np.testing.assert_allclose(np.asarray(out.num[i]),
                                   np.asarray(ref.num),
                                   rtol=1e-5, atol=1e-6)
        np.testing.assert_array_equal(np.asarray(out.semkey[i]),
                                      np.asarray(ref.semkey))
