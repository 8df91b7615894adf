"""Semantic-integration decimation (SETTINGS.sem_integrate_every):
fuse_sequence with k > 1 must equal a reference run that integrates the
key state only on frames where idx % k == 0 (geo identical on every
frame). Covers the lax.cond path in rowvol.integrate_rows."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from segfusion_tpu.config import Config, _DEFAULTS, _merge_defaults
from segfusion_tpu.core.pipeline import Pipeline
from segfusion_tpu.core.volume import init_scene_volume
from segfusion_tpu.models.adapnet import SegmenterAdapter, build_adapnet

H = W = 48
N_CLASSES = 6


def _config(sem_every=1):
    cfg = _merge_defaults(Config({}), _DEFAULTS)
    cfg.DATA.resx = W
    cfg.DATA.resy = H
    cfg.DATA.init_value = 0.1
    cfg.DATA.semantics = "class6"
    cfg.DATA.semantic_strategy = "predict"
    cfg.FUSION_MODEL.name = "v3"
    cfg.FUSION_MODEL.n_points = 5
    cfg.FUSION_MODEL.n_tail_points = 4
    cfg.FUSION_MODEL.growth_factor = 2
    cfg.FUSION_MODEL.use_semantics = True
    cfg.SEMANTIC_2D_MODEL.n_classes = N_CLASSES
    cfg.SEMANTIC_2D_MODEL.stage = 1
    cfg.SETTINGS.sem_integrate_every = sem_every
    # the reference loop below runs the segmenter per frame; the batched
    # pre-pass is equal only to 1 ulp in scores (tests/test_sem_prepass),
    # and the packed key comparison here is EXACT
    cfg.SETTINGS.sem_prepass = "off"
    return cfg


@pytest.fixture(scope="module")
def segmenter():
    cfg = _config()
    model = build_adapnet(cfg.SEMANTIC_2D_MODEL)
    seg_vars = model.init(jax.random.PRNGKey(1),
                          jnp.zeros((1, H, W, 3)), train=False)
    seg_params = (seg_vars["params"], seg_vars.get("batch_stats", {}))
    return SegmenterAdapter(model, "tof_depth"), seg_params


def _frames(T):
    rng = np.random.RandomState(0)
    depth = 1.0 + 0.5 * rng.rand(T, H, W).astype(np.float32)
    depth[:, :4, :4] = 0.0
    gray = np.clip(255.0 * (depth / 2.0), 0, 255)
    poses = np.tile(np.eye(4, dtype=np.float32), (T, 1, 1))
    poses[:, 2, 3] = -1.5
    f = 0.5 * W
    intr = np.array([[f, 0, W / 2], [0, f, H / 2], [0, 0, 1]], np.float32)
    return {
        "depth": jnp.asarray(depth),
        "depth_input": jnp.asarray(depth),
        "image": jnp.asarray(np.repeat(gray[..., None], 3, axis=-1)),
        "extrinsics": jnp.asarray(poses),
        "intrinsics": jnp.broadcast_to(jnp.asarray(intr), (T, 3, 3)),
        "mask": jnp.asarray(depth > 0),
    }


def _vol():
    return init_scene_volume((32, 32, 32),
                             np.array([-1.6, -1.6, -1.6], np.float32),
                             0.1, 0.1)


def test_decimated_sequence_matches_masked_reference(segmenter):
    """k=2 over 5 frames == per-frame steps where frames 1 and 3 carry a
    do_sem=False gate (geo every frame, keys on 0, 2, 4)."""
    adapter, seg_params = segmenter
    T, k = 5, 2

    pipe = Pipeline(_config(sem_every=k), segmenter=adapter)
    params, stats = pipe.init_fusion_params(jax.random.PRNGKey(0), H, W)
    out = pipe.fuse_sequence((params, stats), _vol(), _frames(T),
                             seg_params)

    # reference: per-frame row steps with an explicit python-level gate
    ref_pipe = Pipeline(_config(sem_every=1), segmenter=adapter)
    layout, rv = ref_pipe._rows_from_volume(_vol())
    stream = ref_pipe._new_stream(layout, rv)
    frames = _frames(T)
    for i in range(T):
        fr = jax.tree_util.tree_map(lambda x: x[i], frames)
        carry = (None if stream.shadow is None
                 else (stream.shadow, stream.dirty))
        rv, carry = ref_pipe.step_fuse_rows_impl(
            (params, stats), layout, stream.rv, fr, seg_params,
            shadow_carry=carry,
            do_sem=jnp.asarray(i % k == 0))
        from segfusion_tpu.core.pipeline import RowStream
        stream = (RowStream(rv, carry[0], carry[1]) if carry is not None
                  else RowStream(rv, None, None))
    want = ref_pipe._volume_from_rows(stream.rv, layout)

    np.testing.assert_allclose(np.asarray(out.num), np.asarray(want.num),
                               rtol=1e-5, atol=1e-6)
    np.testing.assert_array_equal(np.asarray(out.semkey),
                                  np.asarray(want.semkey))


def test_decimation_only_drops_key_updates(segmenter):
    """vs the exact k=1 run: geo state identical, keys differ only where
    skipped frames were the sole observers (a superset check: every
    decimated key is either 0 or equals the exact run's key)."""
    adapter, seg_params = segmenter
    T = 4
    pipe1 = Pipeline(_config(sem_every=1), segmenter=adapter)
    params, stats = pipe1.init_fusion_params(jax.random.PRNGKey(0), H, W)
    exact = pipe1.fuse_sequence((params, stats), _vol(), _frames(T),
                                seg_params)
    pipe2 = Pipeline(_config(sem_every=2), segmenter=adapter)
    dec = pipe2.fuse_sequence((params, stats), _vol(), _frames(T),
                              seg_params)
    np.testing.assert_allclose(np.asarray(exact.num),
                               np.asarray(dec.num), rtol=1e-6)
    np.testing.assert_allclose(np.asarray(exact.weights),
                               np.asarray(dec.weights), rtol=1e-6)
    kd = np.asarray(dec.semkey)
    ke = np.asarray(exact.semkey)
    assert ((kd == 0) | (kd <= ke)).all()
    assert (kd > 0).any()                  # frames 0/2 still integrated
