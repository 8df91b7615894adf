"""Model tests: shapes, param counts, train/eval modes, both AdapNet stages."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from segfusion_tpu.config import Config
from segfusion_tpu.models import (AdapNet, FusionNetV1, FusionNetV2,
                                  FusionNetV3, build_fusion_net)


def fusion_inputs(h=32, w=32, n=9, sem=False):
    d = {
        "tsdf_values": jnp.zeros((1, h, w, n)),
        "tsdf_weights": jnp.zeros((1, h, w, n)),
        "tsdf_frame": jnp.zeros((1, h, w, 1)),
    }
    if sem:
        d["semantic_frame"] = jnp.zeros((1, h, w, 1))
    return d


@pytest.mark.parametrize("cls,kw", [
    (FusionNetV1, {}),
    (FusionNetV2, {"growth_factor": 3}),
    (FusionNetV3, {"growth_factor": 3}),
])
def test_fusionnet_shapes(cls, kw):
    net = cls(n_points=9, use_semantics=False, **kw)
    x = fusion_inputs()
    vs = net.init(jax.random.PRNGKey(0), x, train=False)
    y = net.apply(vs, x, train=False)
    assert y.shape == (1, 32, 32, 9)
    assert np.all(np.abs(np.asarray(y)) <= 1.0)  # tanh * scale 1.0


def test_fusionnet_v3_semantic_head():
    net = FusionNetV3(n_points=5, use_semantics=True, growth_factor=2)
    x = fusion_inputs(n=5, sem=True)
    vs = net.init(jax.random.PRNGKey(0), x, train=False)
    y = net.apply(vs, x, train=False)
    assert y.shape == (1, 32, 32, 5)
    # two heads double the trunk params vs the non-semantic variant
    net2 = FusionNetV3(n_points=5, use_semantics=False, growth_factor=2)
    x2 = fusion_inputs(n=5, sem=False)
    vs2 = net2.init(jax.random.PRNGKey(0), x2, train=False)
    n_sem = sum(np.prod(p.shape) for p in jax.tree_util.tree_leaves(vs["params"]))
    n_plain = sum(np.prod(p.shape) for p in jax.tree_util.tree_leaves(vs2["params"]))
    assert n_sem > n_plain


def test_fusionnet_train_mode_updates_stats():
    net = FusionNetV2(n_points=5, growth_factor=2)
    x = {k: v + 0.5 for k, v in fusion_inputs(n=5).items()}
    vs = net.init(jax.random.PRNGKey(0), x, train=False)
    y, mutated = net.apply(vs, x, train=True,
                           rngs={"dropout": jax.random.PRNGKey(1)},
                           mutable=["batch_stats"])
    before = jax.tree_util.tree_leaves(vs["batch_stats"])
    after = jax.tree_util.tree_leaves(mutated["batch_stats"])
    assert any(float(jnp.sum(jnp.abs(a - b))) > 0
               for a, b in zip(before, after))


def test_build_fusion_net_factory():
    cfg = Config({"name": "v3", "n_points": 9, "n_tail_points": 7,
                  "growth_factor": 6, "use_semantics": True,
                  "output_scale": 1.0})
    net = build_fusion_net(cfg)
    assert isinstance(net, FusionNetV3)


def test_adapnet_stage1_shapes():
    net = AdapNet(n_classes=10, stage=1)
    x = jnp.zeros((1, 64, 64, 3))
    vs = net.init(jax.random.PRNGKey(0), x, train=False)
    res, aux1, aux2 = net.apply(vs, x, train=False)
    assert res.shape == (1, 64, 64, 10)
    assert aux1.shape == (1, 64, 64, 10)
    assert aux2.shape == (1, 64, 64, 10)
    n_params = sum(np.prod(p.shape)
                   for p in jax.tree_util.tree_leaves(vs["params"]))
    assert n_params > 20e6  # ResNet-50 scale


def test_adapnet_stage2_fusion():
    net = AdapNet(n_classes=10, stage=2)
    rgb = jnp.zeros((1, 64, 64, 3))
    dep = jnp.zeros((1, 64, 64, 3))
    vs = net.init(jax.random.PRNGKey(0), rgb, dep, train=False)
    res, aux1, aux2 = net.apply(vs, rgb, dep, train=False)
    assert res.shape == (1, 64, 64, 10)
    # two encoders -> roughly double encoder params
    keys = list(vs["params"].keys())
    assert "encoder_mod1" in keys and "encoder_mod2" in keys
    assert "ssma_res" in keys
