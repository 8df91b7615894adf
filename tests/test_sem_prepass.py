"""Batched semantic pre-pass: the 2D segmentation forward depends only on
the frame (never on the fusion state), so sequence scans run it over the
whole chunk BEFORE the fusion scan, amortising AdapNet's per-conv dispatch
floor over sem_prepass_batch frames. These tests pin (a) the batched
adapter == per-frame adapter, (b) fuse_sequence with the pre-pass ==
without, including the T % batch != 0 padding path."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from segfusion_tpu.config import Config, _DEFAULTS, _merge_defaults
from segfusion_tpu.core.pipeline import Pipeline
from segfusion_tpu.core.volume import init_scene_volume
from segfusion_tpu.models.adapnet import SegmenterAdapter, build_adapnet

H = W = 64
N_CLASSES = 6


def _config():
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
    cfg.SETTINGS.sem_prepass_batch = 2
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
    # a few invalid rays so the ray mask has both values
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


def test_apply_fn_batched_matches_single(segmenter):
    adapter, seg_params = segmenter
    frames = _frames(3)
    batched = adapter.apply_fn_batched(seg_params, frames["image"],
                                       frames["depth_input"])
    for i in range(3):
        single = adapter.apply_fn(seg_params, frames["image"][i],
                                  frames["depth_input"][i])
        np.testing.assert_allclose(np.asarray(batched[i]),
                                   np.asarray(single), rtol=1e-5,
                                   atol=1e-5)


def test_predict_semantics_batched_matches_per_frame(segmenter):
    adapter, seg_params = segmenter
    pipe = Pipeline(_config(), segmenter=adapter)
    frames = _frames(5)  # 5 % batch(2) != 0 -> exercises the padding path
    ids_b, scores_b = pipe._predict_semantics_batched(
        seg_params, frames["image"], frames["depth_input"])
    assert ids_b.shape == (5, H * W) and scores_b.shape == (5, H * W)
    for i in range(5):
        ids_s, scores_s = pipe._predict_semantics(
            seg_params, frames["image"][i], frames["depth_input"][i])
        np.testing.assert_array_equal(np.asarray(ids_b[i]),
                                      np.asarray(ids_s))
        np.testing.assert_allclose(np.asarray(scores_b[i]),
                                   np.asarray(scores_s), rtol=1e-5,
                                   atol=1e-6)


def test_prepass_moves_segmenter_out_of_fusion_scan(segmenter):
    """Structural check on the traced graph: with the pre-pass on, the
    fusion scan body must carry NO AdapNet convs (they live in the
    separate batched pre-pass scan); off, one scan holds both nets."""
    adapter, seg_params = segmenter

    def scan_conv_counts(flag):
        cfg = _config()
        cfg.SETTINGS.sem_prepass = flag
        pipe = Pipeline(cfg, segmenter=adapter)
        params, stats = pipe.init_fusion_params(jax.random.PRNGKey(0),
                                                H, W)
        vol = init_scene_volume((32, 32, 32),
                                np.array([-1.6, -1.6, -1.6], np.float32),
                                0.1, cfg.DATA.init_value)
        jpr = jax.make_jaxpr(pipe.fuse_sequence_impl)(
            (params, stats), vol, _frames(4), seg_params)
        return sorted(
            sum(1 for e in eqn.params["jaxpr"].jaxpr.eqns
                if "conv" in e.primitive.name)
            for eqn in jpr.jaxpr.eqns if eqn.primitive.name == "scan")

    counts_on = scan_conv_counts("on")
    (counts_off,) = scan_conv_counts("off")
    assert len(counts_on) == 2            # pre-pass scan + fusion scan
    assert sum(counts_on) == counts_off   # same convs, relocated
    assert min(counts_on) > 0             # both nets still conv-based


def _run_sequence(sem_prepass, segmenter, T=5):
    adapter, seg_params = segmenter
    cfg = _config()
    cfg.SETTINGS.sem_prepass = sem_prepass
    pipe = Pipeline(cfg, segmenter=adapter)
    params, stats = pipe.init_fusion_params(jax.random.PRNGKey(0), H, W)
    volume = init_scene_volume((32, 32, 32),
                               np.array([-1.6, -1.6, -1.6], np.float32),
                               0.1, cfg.DATA.init_value)
    out = pipe.fuse_sequence((params, stats), volume, _frames(T),
                             seg_params)
    return jax.device_get((out.num, out.weights, out.semkey))


def test_scene_parallel_prepass_matches_sequential(segmenter):
    """The vmapped+sharded multi-scene path (bench multi512 shape) must
    compose with the pre-pass: run_sequences with the pre-pass on equals
    per-scene fuse_sequence with it off."""
    from segfusion_tpu.parallel.scene_parallel import (SceneParallelFusion,
                                                       stack_volumes)
    from segfusion_tpu.ops.integrate import unpack_semantic_key

    adapter, seg_params = segmenter
    cfg = _config()
    pipe = Pipeline(cfg, segmenter=adapter)
    params, stats = pipe.init_fusion_params(jax.random.PRNGKey(0), H, W)

    def mkvol():
        return init_scene_volume((32, 32, 32),
                                 np.array([-1.6, -1.6, -1.6], np.float32),
                                 0.1, cfg.DATA.init_value)

    T = 3
    f0, f1 = _frames(T), _frames(T)
    f1 = {k: (v + 0.05 if k in ("depth", "depth_input") else v)
          for k, v in f1.items()}
    f1["mask"] = f1["depth"] > 0

    sp = SceneParallelFusion(pipe)
    stacked = sp.shard_volumes(stack_volumes([mkvol(), mkvol()]))
    frames_s = jax.tree_util.tree_map(
        lambda a, b: jnp.stack([a, b]), f0, f1)
    out = sp.run_sequences((params, stats), stacked, frames_s, seg_params)

    cfg_off = _config()
    cfg_off.SETTINGS.sem_prepass = "off"
    pipe_off = Pipeline(cfg_off, segmenter=adapter)
    for i, f in enumerate((f0, f1)):
        ref = pipe_off.fuse_sequence((params, stats), mkvol(), f,
                                     seg_params)
        np.testing.assert_allclose(np.asarray(out.num[i]),
                                   np.asarray(ref.num), rtol=1e-5,
                                   atol=1e-6)
        s_a, i_a = unpack_semantic_key(out.semkey[i])
        s_b, i_b = unpack_semantic_key(ref.semkey)
        np.testing.assert_array_equal(np.asarray(i_a), np.asarray(i_b))
        np.testing.assert_allclose(np.asarray(s_a), np.asarray(s_b),
                                   rtol=1e-5, atol=1e-6)


def test_fuse_sequence_prepass_equivalence(segmenter):
    from segfusion_tpu.ops.integrate import unpack_semantic_key

    num_on, w_on, key_on = _run_sequence("on", segmenter)
    num_off, w_off, key_off = _run_sequence("off", segmenter)
    assert float(np.abs(np.asarray(w_on)).sum()) > 0  # stream did fuse
    np.testing.assert_allclose(num_on, num_off, rtol=1e-5, atol=1e-6)
    np.testing.assert_allclose(w_on, w_off, rtol=1e-5, atol=1e-6)
    # the packed (score, id) keys may differ by 1 ulp in the score field
    # (batched vs single conv reduction order); ids must agree exactly
    s_on, i_on = (np.asarray(x) for x in unpack_semantic_key(key_on))
    s_off, i_off = (np.asarray(x) for x in unpack_semantic_key(key_off))
    np.testing.assert_array_equal(i_on, i_off)
    np.testing.assert_allclose(s_on, s_off, rtol=1e-5, atol=1e-6)
