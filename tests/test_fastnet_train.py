"""Training-mode matmul executor (fusionnet_fast.apply_v3_train) vs the
Flax FusionNetV3 train forward: outputs, BN running-stat updates, and
gradients agree (dropout disabled on both sides -- the executor uses its
own dropout rng stream, so stochastic parity is impossible by design)."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from segfusion_tpu.models import fusionnet_fast as ff
from segfusion_tpu.models.fusionnet import FusionNetV3

H = W = 24
NP_ = 5
GF = 3


def _inputs(use_semantics, seed=0):
    rng = np.random.RandomState(seed)
    d = {
        "tsdf_values": jnp.asarray(
            rng.randn(1, H, W, NP_).astype(np.float32) * 0.1),
        "tsdf_weights": jnp.asarray(
            np.abs(rng.randn(1, H, W, NP_)).astype(np.float32)),
        "tsdf_frame": jnp.asarray(
            rng.rand(1, H, W, 1).astype(np.float32) * 2),
    }
    if use_semantics:
        d["semantic_frame"] = jnp.asarray(
            rng.rand(1, H, W, 1).astype(np.float32))
    return d


@pytest.mark.parametrize("use_semantics", [True, False])
def test_train_forward_and_stats_match_flax(use_semantics):
    model = FusionNetV3(n_points=NP_, use_semantics=use_semantics,
                        growth_factor=GF, dropout=0.0)
    inputs = _inputs(use_semantics)
    variables = model.init(jax.random.PRNGKey(0), inputs, train=False)
    params, stats = variables["params"], variables["batch_stats"]

    want, mut = model.apply({"params": params, "batch_stats": stats},
                            inputs, train=True,
                            rngs={"dropout": jax.random.PRNGKey(1)},
                            mutable=["batch_stats"])
    got, new_stats = ff.apply_v3_train(
        params, stats, inputs, jax.random.PRNGKey(1),
        growth_factor=GF, use_semantics=use_semantics, n_points=NP_,
        dropout_rate=0.0, dtype=jnp.float32)

    want_flat = np.asarray(want[..., :NP_]).reshape(1, H * W, NP_)
    np.testing.assert_allclose(np.asarray(got), want_flat,
                               rtol=2e-4, atol=2e-5)

    fl, _ = jax.tree_util.tree_flatten(mut["batch_stats"])
    gl, gt = jax.tree_util.tree_flatten(new_stats)
    assert jax.tree_util.tree_structure(mut["batch_stats"]) == gt
    for a, b in zip(fl, gl):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=2e-4, atol=2e-5)


def test_train_grads_match_flax():
    use_semantics = True
    model = FusionNetV3(n_points=NP_, use_semantics=use_semantics,
                        growth_factor=GF, dropout=0.0)
    inputs = _inputs(use_semantics)
    variables = model.init(jax.random.PRNGKey(0), inputs, train=False)
    params, stats = variables["params"], variables["batch_stats"]
    tgt = jnp.asarray(np.random.RandomState(3).randn(
        1, H * W, NP_).astype(np.float32) * 0.05)

    def loss_flax(p):
        out, _ = model.apply({"params": p, "batch_stats": stats},
                             inputs, train=True,
                             rngs={"dropout": jax.random.PRNGKey(1)},
                             mutable=["batch_stats"])
        est = out[..., :NP_].reshape(1, H * W, NP_)
        return jnp.mean((est - tgt) ** 2)

    def loss_fast(p):
        est, _ = ff.apply_v3_train(
            p, stats, inputs, jax.random.PRNGKey(1), growth_factor=GF,
            use_semantics=use_semantics, n_points=NP_, dropout_rate=0.0,
            dtype=jnp.float32)
        return jnp.mean((est - tgt) ** 2)

    gw = jax.grad(loss_flax)(params)
    gg = jax.grad(loss_fast)(params)
    assert (jax.tree_util.tree_structure(gw)
            == jax.tree_util.tree_structure(gg))
    for a, b in zip(jax.tree_util.tree_leaves(gw),
                    jax.tree_util.tree_leaves(gg)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=5e-3, atol=2e-5)


def test_dropout_active_and_channel_broadcast():
    """rate 0.5: distinct rngs give distinct outputs; a dropped channel
    is zero across ALL pixels (broadcast_dims=(1, 2) semantics)."""
    model = FusionNetV3(n_points=NP_, use_semantics=False,
                        growth_factor=GF)
    inputs = _inputs(False)
    variables = model.init(jax.random.PRNGKey(0), inputs, train=False)
    params, stats = variables["params"], variables["batch_stats"]
    a, _ = ff.apply_v3_train(params, stats, inputs, jax.random.PRNGKey(1),
                             growth_factor=GF, use_semantics=False,
                             n_points=NP_, dropout_rate=0.5,
                             dtype=jnp.float32)
    b, _ = ff.apply_v3_train(params, stats, inputs, jax.random.PRNGKey(2),
                             growth_factor=GF, use_semantics=False,
                             n_points=NP_, dropout_rate=0.5,
                             dtype=jnp.float32)
    assert np.isfinite(np.asarray(a)).all()
    assert not np.allclose(np.asarray(a), np.asarray(b))


def test_pipeline_train_step_uses_executor():
    """Pipeline with fused_net_train on: finite loss, Flax-structured
    grads, and updated batch stats."""
    from segfusion_tpu.config import Config, _DEFAULTS, _merge_defaults
    from segfusion_tpu.core.pipeline import Pipeline
    from segfusion_tpu.core.volume import init_scene_volume

    cfg = _merge_defaults(Config({}), _DEFAULTS)
    cfg.DATA.resx = W
    cfg.DATA.resy = H
    cfg.DATA.init_value = 0.1
    cfg.FUSION_MODEL.name = "v3"
    cfg.FUSION_MODEL.n_points = NP_
    cfg.FUSION_MODEL.n_tail_points = 4
    cfg.FUSION_MODEL.growth_factor = GF
    cfg.FUSION_MODEL.use_semantics = False
    cfg.SETTINGS.fused_net_train = "on"
    pipe = Pipeline(cfg)
    assert pipe.fused_net_train
    params, stats = pipe.init_fusion_params(jax.random.PRNGKey(0), H, W)
    vol = init_scene_volume((24, 24, 24),
                            np.array([-0.6, -0.6, -0.6], np.float32),
                            0.05, 0.1)
    gt = jnp.zeros((24, 24, 24), jnp.float32)
    frame = {
        "depth": jnp.full((H, W), 0.8, jnp.float32),
        "extrinsics": jnp.eye(4, dtype=jnp.float32),
        "intrinsics": jnp.asarray([[12.0, 0, W / 2], [0, 12.0, H / 2],
                                   [0, 0, 1]], jnp.float32),
        "mask": jnp.ones((H, W), bool),
    }
    loss, grads, new_vol, new_stats = pipe.step_train_impl(
        params, stats, vol, gt, frame, None, jax.random.PRNGKey(2))
    assert np.isfinite(float(loss))
    assert (jax.tree_util.tree_structure(grads)
            == jax.tree_util.tree_structure(params))
    gnorm = sum(float(jnp.sum(jnp.abs(g)))
                for g in jax.tree_util.tree_leaves(grads))
    assert gnorm > 0.0
    assert (jax.tree_util.tree_structure(new_stats)
            == jax.tree_util.tree_structure(stats))
