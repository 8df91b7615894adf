"""Numerical parity vs the reference FusionNet (torch, CPU).

Instantiates the reference model from /root/reference (read-only, torch-only
module), converts its random-initialised state_dict with
utils.torch_convert, and checks that this framework's Flax FusionNet
produces the same outputs on the same inputs -- validating both the model
re-implementation and the checkpoint converter. Skipped when the reference
checkout is unavailable.
"""

import importlib.util
import os
import sys

import numpy as np
import pytest

REF = "/root/reference"
pytestmark = pytest.mark.skipif(
    not os.path.exists(os.path.join(REF, "modules", "model.py")),
    reason="reference checkout not available")


def load_reference_model_module():
    spec = importlib.util.spec_from_file_location(
        "ref_model", os.path.join(REF, "modules", "model.py"))
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod


class _Cfg(dict):
    __getattr__ = dict.__getitem__


def _torch_inputs(np_inputs):
    import torch
    return {k: torch.from_numpy(np.transpose(v, (0, 3, 1, 2)).copy())
            for k, v in np_inputs.items()}


@pytest.mark.parametrize("use_semantics", [False, True])
def test_fusionnet_v3_matches_reference(use_semantics):
    import torch
    import jax
    import jax.numpy as jnp

    from segfusion_tpu.models.fusionnet import FusionNetV3
    from segfusion_tpu.utils.torch_convert import (
        convert_fusionnet_state_dict)

    ref = load_reference_model_module()
    n_points, gf, h, w = 5, 3, 16, 16
    cfg = _Cfg(name="v3", output_scale=1.0, n_points=n_points,
               growth_factor=gf, use_semantics=use_semantics,
               resx=w, resy=h)
    tmodel = ref.FusionNet_v3(cfg)
    tmodel.eval()
    state = {k: v.detach().numpy() for k, v in tmodel.state_dict().items()}

    rng = np.random.RandomState(0)
    np_in = {
        "tsdf_values": rng.randn(1, h, w, n_points).astype(np.float32) * .05,
        "tsdf_weights": rng.uniform(0, 3, (1, h, w, n_points)).astype(
            np.float32),
        "tsdf_frame": rng.uniform(0.5, 3, (1, h, w, 1)).astype(np.float32),
    }
    if use_semantics:
        np_in["semantic_frame"] = rng.uniform(
            0, 1, (1, h, w, 1)).astype(np.float32)

    with torch.no_grad():
        t_out = tmodel({k: v for k, v in _torch_inputs(np_in).items()})
    t_out = np.transpose(t_out.numpy(), (0, 2, 3, 1))

    fmodel = FusionNetV3(n_points=n_points, use_semantics=use_semantics,
                         output_scale=1.0, growth_factor=gf)
    variables = fmodel.init(jax.random.PRNGKey(0),
                            {k: jnp.asarray(v) for k, v in np_in.items()},
                            train=False)
    params, stats = convert_fusionnet_state_dict(
        state, variables["params"], variables.get("batch_stats", {}),
        dict(cfg))
    f_out = fmodel.apply({"params": params, "batch_stats": stats},
                         {k: jnp.asarray(v) for k, v in np_in.items()},
                         train=False)
    np.testing.assert_allclose(np.asarray(f_out), t_out, atol=2e-4,
                               rtol=1e-3)


def test_fusionnet_v2_matches_reference():
    import torch
    import jax
    import jax.numpy as jnp

    from segfusion_tpu.models.fusionnet import FusionNetV2
    from segfusion_tpu.utils.torch_convert import (
        convert_fusionnet_state_dict)

    ref = load_reference_model_module()
    n_points, gf, h, w = 5, 3, 16, 16
    cfg = _Cfg(name="v2", output_scale=1.0, n_points=n_points,
               growth_factor=gf, use_semantics=False, resx=w, resy=h)
    tmodel = ref.FusionNet_v2(cfg)
    tmodel.eval()
    state = {k: v.detach().numpy() for k, v in tmodel.state_dict().items()}

    rng = np.random.RandomState(1)
    np_in = {
        "tsdf_values": rng.randn(1, h, w, n_points).astype(np.float32) * .05,
        "tsdf_weights": rng.uniform(0, 3, (1, h, w, n_points)).astype(
            np.float32),
        "tsdf_frame": rng.uniform(0.5, 3, (1, h, w, 1)).astype(np.float32),
    }
    with torch.no_grad():
        t_out = tmodel(_torch_inputs(np_in))
    t_out = np.transpose(t_out.numpy(), (0, 2, 3, 1))

    fmodel = FusionNetV2(n_points=n_points, use_semantics=False,
                         output_scale=1.0, growth_factor=gf)
    variables = fmodel.init(jax.random.PRNGKey(0),
                            {k: jnp.asarray(v) for k, v in np_in.items()},
                            train=False)
    params, stats = convert_fusionnet_state_dict(
        state, variables["params"], variables.get("batch_stats", {}),
        dict(cfg))
    f_out = fmodel.apply({"params": params, "batch_stats": stats},
                         {k: jnp.asarray(v) for k, v in np_in.items()},
                         train=False)
    np.testing.assert_allclose(np.asarray(f_out), t_out, atol=2e-4,
                               rtol=1e-3)
