"""torchvision resnet50 -> Flax Encoder import (ImageNet stage-1 init).

Validates convert_resnet50_encoder two ways:
  1. against the REFERENCE surgery: every weight the importer claims
     survives (reference modules/adapnet.py:101-130) must be carried
     unchanged into a reference Encoder built from the same resnet50,
     and the stem must NOT survive (it is re-created, adapnet.py:103);
  2. mechanically: imported flax leaves equal the transposed torch
     values, everything else keeps its fresh init.
"""

import importlib.util
import os
import sys

import numpy as np
import pytest

REF = "/root/reference"
sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))


def _tv_resnet50():
    import fake_torchvision
    fake_torchvision.install()
    import torch
    torch.manual_seed(7)
    return fake_torchvision.resnet50()


def _numpy_state(module):
    return {k: v.detach().numpy() for k, v in module.state_dict().items()}


@pytest.mark.skipif(not os.path.exists(os.path.join(REF, "modules",
                                                    "adapnet.py")),
                    reason="reference checkout not available")
@pytest.mark.slow
def test_surviving_map_matches_reference_surgery():
    import fake_torchvision
    fake_torchvision.install()
    tv = _tv_resnet50()
    tv_state = _numpy_state(tv)

    spec = importlib.util.spec_from_file_location(
        "ref_adapnet", os.path.join(REF, "modules", "adapnet.py"))
    ref = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(ref)
    # make the reference Encoder adopt OUR resnet instance so we can tell
    # which torchvision weights its surgery keeps
    ref.resnet50 = lambda pretrained=False, **kw: tv
    enc_state = _numpy_state(ref.Encoder())

    from segfusion_tpu.utils.torch_convert import _resnet50_surviving_map
    surviving = _resnet50_surviving_map("encoder_mod1")
    for tname in surviving:
        for leaf in ("weight", "bias", "running_mean", "running_var"):
            key = f"{tname}.{leaf}"
            if key not in tv_state:
                continue
            ref_key = f"res_n50_enc.{key}"
            assert ref_key in enc_state, f"reference dropped {ref_key}"
            np.testing.assert_array_equal(
                tv_state[key], enc_state[ref_key],
                err_msg=f"{key} claimed surviving but reference changed it")
    # the stem is re-created by the surgery -> must NOT be imported
    assert not np.array_equal(tv_state["conv1.weight"],
                              enc_state["res_n50_enc.conv1.weight"])
    assert "conv1" not in surviving and "bn1" not in surviving


@pytest.mark.slow
def test_convert_resnet50_encoder_mechanics():
    import jax
    import jax.numpy as jnp

    from segfusion_tpu.models.adapnet import Encoder
    from segfusion_tpu.utils.torch_convert import (
        _resnet50_surviving_map, convert_resnet50_encoder)

    tv_state = _numpy_state(_tv_resnet50())

    enc = Encoder()
    variables = enc.init(jax.random.PRNGKey(0),
                         jnp.zeros((1, 32, 32, 3)), train=False)
    params = {"encoder_mod1": variables["params"]}
    stats = {"encoder_mod1": variables.get("batch_stats", {})}

    new_params, new_stats, n = convert_resnet50_encoder(
        tv_state, params, stats, encoders=("encoder_mod1",))
    # layer1: 3 blocks (1 with downsample) -> convs 3+3+3+1=10, bns 10
    # layer2: 3 full (1 ds) + 1 partial -> convs 10+1, bns 10+1
    # layer3: 2 full (1 ds) + 4 partial -> convs 7+4, bns 7+4
    # layer4: 3 partial + 1 ds -> convs 4, bns 4
    # total conv arrays 36, bn groups 36 (x4 arrays)
    assert n == 36 + 36 * 4

    def leaf(tree, path):
        node = tree
        for p in path:
            node = node[p]
        return np.asarray(node)

    # imported leaves carry the transposed torch values
    m = _resnet50_surviving_map("encoder_mod1")
    w = tv_state["layer1.0.conv2.weight"]
    np.testing.assert_array_equal(
        leaf(new_params, ("encoder_mod1", "Bottleneck_0", "Conv_1",
                          "kernel")),
        np.transpose(w, (2, 3, 1, 0)))
    np.testing.assert_array_equal(
        leaf(new_stats, ("encoder_mod1", "BottleneckSSMA_5", "BatchNorm_4",
                         "var")),
        tv_state["layer4.0.downsample.1.running_var"])
    # non-surviving leaves keep their fresh init (stem + dilated branches)
    np.testing.assert_array_equal(
        leaf(new_params, ("encoder_mod1", "Conv_0", "kernel")),
        leaf(params, ("encoder_mod1", "Conv_0", "kernel")))
    np.testing.assert_array_equal(
        leaf(new_params, ("encoder_mod1", "BottleneckSSMA_0", "Conv_1",
                          "kernel")),
        leaf(params, ("encoder_mod1", "BottleneckSSMA_0", "Conv_1",
                      "kernel")))
    # flax templates were not mutated in place
    assert isinstance(n, int) and n > 0
