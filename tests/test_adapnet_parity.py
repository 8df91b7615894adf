"""Numerical parity vs the reference AdapNet++ (torch, CPU).

Installs a minimal torch ResNet-50 as `torchvision` (fake_torchvision) so
the reference modules/adapnet.py can be instantiated, converts its random
state_dict with utils.torch_convert.convert_adapnet_state_dict, and checks
this framework's Flax AdapNet produces the same main output. The aux heads
use bilinear upsampling where torch aligns corners and jax does not, so
only the full-resolution `res` head (pure conv/deconv path) is compared
tightly.
"""

import importlib.util
import os
import sys

import numpy as np
import pytest

REF = "/root/reference"
pytestmark = pytest.mark.skipif(
    not os.path.exists(os.path.join(REF, "modules", "adapnet.py")),
    reason="reference checkout not available")

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))


def load_reference_adapnet():
    import fake_torchvision
    fake_torchvision.install()
    spec = importlib.util.spec_from_file_location(
        "ref_adapnet", os.path.join(REF, "modules", "adapnet.py"))
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod


class _Cfg(dict):
    __getattr__ = dict.__getitem__


def _disable_forward_dropout(tmodel, stage):
    # the reference creates nn.Dropout inside forward (always train-mode,
    # adapnet.py:80-82); flip the flag the block checks
    tmodel.encoder_mod1.res_n50_enc.layer3[2].dropout = False
    if stage == 2:
        tmodel.encoder_mod2.res_n50_enc.layer3[2].dropout = False


@pytest.mark.slow
@pytest.mark.parametrize("stage", [1, 2])
def test_adapnet_matches_reference(stage):
    import torch
    import jax
    import jax.numpy as jnp

    from segfusion_tpu.models.adapnet import AdapNet
    from segfusion_tpu.utils.torch_convert import convert_adapnet_state_dict

    ref = load_reference_adapnet()
    n_classes, h, w = 7, 64, 64
    torch.manual_seed(0)
    tmodel = ref.AdapNet(_Cfg(stage=stage, n_classes=n_classes))
    tmodel.eval()
    _disable_forward_dropout(tmodel, stage)
    state = {k: v.detach().numpy() for k, v in tmodel.state_dict().items()}

    rng = np.random.RandomState(0)
    rgb = rng.rand(1, h, w, 3).astype(np.float32)
    dep = rng.rand(1, h, w, 3).astype(np.float32)
    t_rgb = torch.from_numpy(np.transpose(rgb, (0, 3, 1, 2)).copy())
    t_dep = torch.from_numpy(np.transpose(dep, (0, 3, 1, 2)).copy())

    with torch.no_grad():
        if stage == 1:
            t_res, t_a1, t_a2 = tmodel(t_rgb)
        else:
            t_res, t_a1, t_a2 = tmodel(t_rgb, t_dep)
    t_res = np.transpose(t_res.numpy(), (0, 2, 3, 1))

    fmodel = AdapNet(n_classes=n_classes, stage=stage)
    if stage == 1:
        variables = fmodel.init(jax.random.PRNGKey(0), jnp.asarray(rgb),
                                train=False)
    else:
        variables = fmodel.init(jax.random.PRNGKey(0), jnp.asarray(rgb),
                                jnp.asarray(dep), train=False)
    params, stats = convert_adapnet_state_dict(
        state, variables["params"], variables.get("batch_stats", {}), stage)
    if stage == 1:
        f_res, f_a1, f_a2 = fmodel.apply(
            {"params": params, "batch_stats": stats}, jnp.asarray(rgb),
            train=False)
    else:
        f_res, f_a1, f_a2 = fmodel.apply(
            {"params": params, "batch_stats": stats}, jnp.asarray(rgb),
            jnp.asarray(dep), train=False)

    np.testing.assert_allclose(np.asarray(f_res), t_res, atol=2e-3,
                               rtol=1e-2)
