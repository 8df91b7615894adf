"""Parity of the folded-BN matmul executor (models/fusionnet_fast) vs
the Flax FusionNetV3 forward (reference modules/model.py:219-282
semantics, already torch-parity-tested in test_torch_parity.py)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from segfusion_tpu.models.fusionnet import FusionNetV3
from segfusion_tpu.models import fusionnet_fast as ff


def _rand_stats(stats, rng):
    """Non-trivial BN running stats so the folding is actually exercised
    (fresh init is mean 0 / var 1, which would hide fold bugs)."""
    leaves, treedef = jax.tree_util.tree_flatten(stats)
    out = []
    for leaf in leaves:
        key = jax.random.fold_in(rng, len(out))
        if leaf.ndim and np.all(np.asarray(leaf) == 1.0):      # var
            out.append(jax.random.uniform(key, leaf.shape,
                                          minval=0.5, maxval=1.5))
        else:                                                  # mean
            out.append(0.1 * jax.random.normal(key, leaf.shape))
    return jax.tree_util.tree_unflatten(treedef, out)


def _setup(use_semantics, h=24, w=16, n_points=9, gf=6):
    net = FusionNetV3(n_points=n_points, use_semantics=use_semantics,
                      growth_factor=gf, output_scale=1.0)
    keys = ["tsdf_values", "tsdf_weights", "tsdf_frame"]
    if use_semantics:
        keys.append("semantic_frame")
    rng = jax.random.PRNGKey(0)
    inputs = {}
    for i, k in enumerate(keys):
        c = n_points if k in ("tsdf_values", "tsdf_weights") else 1
        inputs[k] = 0.2 * jax.random.normal(
            jax.random.fold_in(rng, 100 + i), (1, h, w, c))
    variables = net.init(jax.random.PRNGKey(1), inputs, train=False)
    params = variables["params"]
    stats = _rand_stats(variables["batch_stats"], jax.random.PRNGKey(2))
    ref = net.apply({"params": params, "batch_stats": stats}, inputs,
                    train=False)
    b, hh, ww, c = ref.shape
    ref = np.asarray(ref[..., :n_points].reshape(b, hh * ww, n_points))
    return params, stats, inputs, ref


@pytest.mark.parametrize("use_semantics", [True, False])
@pytest.mark.parametrize("mode", ["dots9", "im2col"])
@pytest.mark.parametrize("pack", [False, True])
def test_fastnet_matches_flax_f32(use_semantics, mode, pack):
    params, stats, inputs, ref = _setup(use_semantics)
    folded = ff.fold_v3(params, stats, use_semantics=use_semantics,
                        pack_vortex=pack)
    got = np.asarray(ff.apply_v3(folded, inputs, dtype=jnp.float32,
                                 conv3x3=mode))
    assert got.shape == ref.shape
    np.testing.assert_allclose(got, ref, rtol=2e-4, atol=2e-5)


def test_fastnet_bf16_tracks_f32():
    """bf16 executor output stays within bf16-rounding distance of the
    f32 forward (same tolerance class as the Flax bf16 path)."""
    params, stats, inputs, ref = _setup(True)
    folded = ff.fold_v3(params, stats, use_semantics=True)
    got = np.asarray(ff.apply_v3(folded, inputs, dtype=jnp.bfloat16))
    assert got.dtype == np.float32
    # tanh output in [-1, 1]; bf16 activations through ~90 layers
    np.testing.assert_allclose(got, ref, atol=0.08)
    assert np.mean(np.abs(got - ref)) < 0.02


def test_pipeline_fused_step_matches_flax_step():
    """Full fuse step (row path) with prepare_params'd weights vs the
    raw Flax tuple: same integrated volume up to executor/f32 tolerance
    (the fast path is forced on via SETTINGS.fused_net)."""
    from segfusion_tpu.config import Config, _DEFAULTS, _merge_defaults
    from segfusion_tpu.core.database import Database
    from segfusion_tpu.core.pipeline import Pipeline
    from segfusion_tpu.data.synthetic import Synthetic

    cfg = _merge_defaults(Config({}), _DEFAULTS)
    cfg.DATA.resx = cfg.DATA.resy = 48
    cfg.DATA.input = "tof_depth"
    cfg.DATA.init_value = 0.24
    cfg.DATA.semantics = "class8"
    cfg.DATA.semantic_strategy = "gt"
    cfg.DATA.semantic_grid = True
    cfg.DATA.n_frames = 4
    cfg.DATA.voxel_resolution = 0.1
    cfg.DATA.noise_sigma = 0.004
    cfg.DATA.n_classes = 8
    cfg.FUSION_MODEL.n_points = 5
    cfg.FUSION_MODEL.n_tail_points = 4
    cfg.FUSION_MODEL.growth_factor = 2
    cfg.FUSION_MODEL.use_semantics = True
    cfg.SEMANTIC_2D_MODEL.n_classes = 8
    cfg.SETTINGS.fused_net = "on"

    data = Synthetic(cfg.DATA)
    db = Database(data, cfg.DATA)
    pipe = Pipeline(cfg)
    assert pipe.fused_net
    params, stats = pipe.init_fusion_params(jax.random.PRNGKey(0), 48, 48)
    stats = _rand_stats(stats, jax.random.PRNGKey(3))

    item = data[0]
    batch = {k: (np.asarray(v)[None] if isinstance(v, np.ndarray) else v)
             for k, v in item.items()} | {"frame_id": [item["frame_id"]]}
    s = data.scenes[0]

    db.reset()
    pipe.fuse(batch, db, params, stats)          # prepare_params inside
    num_fast = np.asarray(db.volumes[s].num)
    w_fast = np.asarray(db.volumes[s].weights)

    db.reset()
    pipe.fused_net = False                       # raw Flax forward
    pipe.fuse(batch, db, params, stats)
    pipe.fused_net = True
    num_ref = np.asarray(db.volumes[s].num)
    w_ref = np.asarray(db.volumes[s].weights)

    np.testing.assert_allclose(w_fast, w_ref, atol=1e-6)
    np.testing.assert_allclose(num_fast, num_ref, atol=5e-4)


def test_fastnet_wrapper_and_flat_input_shapes():
    """(H, W, C) inputs (no batch dim) work -- the pipeline feeds the
    executor extraction columns without the NHWC round-trip."""
    params, stats, inputs, ref = _setup(True)
    fast = ff.FastV3(params, stats, use_semantics=True, dtype=jnp.float32)
    flat = {k: v[0] for k, v in inputs.items()}
    got = np.asarray(fast(flat))
    np.testing.assert_allclose(got, ref, rtol=2e-4, atol=2e-5)
