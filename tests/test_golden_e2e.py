"""Golden end-to-end parity: this framework's fused volumes vs the
REFERENCE torch pipeline run frame-by-frame on the same stream.

Runs the reference ``Pipeline.fuse`` (reference modules/pipeline.py:173-248
with the real Extractor + Integrator) over a synthetic scene using a
randomly-initialised reference FusionNet v3 (+semantics, gt strategy),
converts those exact weights into this framework, fuses the same frames
here, and asserts volume-level agreement. This pins SYSTEM behaviour
(extraction sampling, network IO prep, masking, integration math), not
just the model forward like tests/test_torch_parity.py.

Expected, bounded differences:
  * the reference casts per-frame updates to float16 before write-back
    (modules/integrator.py:78-83) -> ~1e-3-relative drift per frame;
  * duplicate same-score semantic writes are racy in the reference
    (last-write-wins) vs deterministic max-id here -> rare label
    disagreements at class boundaries only.
"""

import importlib
import os
import sys

import numpy as np
import pytest

REF = "/root/reference"
pytestmark = pytest.mark.skipif(
    not os.path.exists(os.path.join(REF, "modules", "pipeline.py")),
    reason="reference checkout not available")

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))


class _C(dict):
    """Attr-dict that returns None for missing keys (reference configs
    tolerate absent optional fields)."""
    def __getattr__(self, k):
        return self.get(k)

    __setattr__ = dict.__setitem__


def _ref_config(cfg):
    """Reference-shaped config mirroring our test config."""
    return _C(
        SETTINGS=_C(gpu=False, device="cpu", implementation="standard"),
        FUSION_MODEL=_C(name="v3", output_scale=1.0,
                        n_points=int(cfg.FUSION_MODEL.n_points),
                        n_tail_points=int(cfg.FUSION_MODEL.n_tail_points),
                        growth_factor=int(cfg.FUSION_MODEL.growth_factor),
                        use_semantics=True),
        SEMANTIC_2D_MODEL=_C(stage=1, n_classes=8),
        DATA=_C(input="tof_depth", semantics="class8",
                semantic_strategy="gt",
                init_value=float(cfg.DATA.init_value),
                resx=int(cfg.DATA.resx), resy=int(cfg.DATA.resy)),
        TESTING=_C(),
    )


class _FakeRefDatabase:
    """Duck-typed stand-in for the reference Database: per-scene volume
    dict + the attributes Pipeline.fuse writes back (reference
    modules/pipeline.py:239-244). Avoids the reference database's
    graphics/trimesh/skimage dependency stack."""

    class _Vol:
        def __init__(self, volume):
            self.volume = volume

    def __init__(self, scene_id, tsdf, weights, ids, scores, origin,
                 resolution):
        import torch
        self.scene_id = scene_id
        self.scenes_est = {scene_id: self._Vol(torch.from_numpy(tsdf))}
        self.fusion_weights = {scene_id: torch.from_numpy(weights)}
        self.ids_est = {scene_id: self._Vol(torch.from_numpy(ids))}
        self.scores = {scene_id: self._Vol(torch.from_numpy(scores))}
        self.origin = torch.from_numpy(origin.astype(np.float32))
        self.resolution = float(resolution)
        self.state = {scene_id: False}

    def __getitem__(self, scene_id):
        return {
            "current": self.scenes_est[scene_id].volume,
            "weights": self.fusion_weights[scene_id],
            "origin": self.origin,
            "resolution": self.resolution,
            "scores": self.scores[scene_id].volume,
            "ids_est": self.ids_est[scene_id].volume,
            "gt": None,
        }


def _torch_batch(b):
    import torch
    return {
        "image": torch.from_numpy(
            np.transpose(b["image"], (0, 3, 1, 2)).copy()).float(),
        "tof_depth": torch.from_numpy(b["tof_depth"][:, None].copy()),
        "mask": torch.from_numpy(np.asarray(b["mask"])),
        "extrinsics": torch.from_numpy(b["extrinsics"].copy()),
        "intrinsics": torch.from_numpy(b["intrinsics"].copy()),
        "semantic_gt": torch.from_numpy(
            b["semantic_gt"].astype(np.int64)),
        "frame_id": list(b["frame_id"]),
    }


@pytest.fixture
def reference_on_path():
    """Put the reference checkout on sys.path for the duration of the
    test, then REMOVE it and purge reference-origin modules -- the
    reference's top-level train_fusion.py etc. otherwise shadow this
    repo's CLIs for any test that runs after this one."""
    sys.path.insert(0, REF)
    try:
        yield
    finally:
        while REF in sys.path:
            sys.path.remove(REF)
        for name, mod in list(sys.modules.items()):
            if getattr(mod, "__file__", None) and \
                    str(getattr(mod, "__file__")).startswith(REF):
                del sys.modules[name]


@pytest.mark.slow
def test_golden_e2e_matches_reference_pipeline(reference_on_path):
    import torch
    import jax
    import jax.numpy as jnp

    import fake_torchvision
    fake_torchvision.install()
    ref_pipeline_mod = importlib.import_module("modules.pipeline")

    from segfusion_tpu.core.database import Database
    from segfusion_tpu.core.pipeline import Pipeline
    from segfusion_tpu.data.synthetic import Synthetic
    from segfusion_tpu.utils.torch_convert import (
        convert_fusionnet_state_dict)
    from tests.test_pipeline import small_config, _batch

    cfg = small_config(use_semantics=True, semantics="class8", h=32, w=32)
    cfg.DATA.semantic_grid = True
    n_frames = 4

    data = Synthetic(cfg.DATA)
    db = Database(data, cfg.DATA)
    pipe = Pipeline(cfg)
    params_t, stats_t = pipe.init_fusion_params(jax.random.PRNGKey(0),
                                                32, 32)

    # reference pipeline with its own randomly-initialised FusionNet v3
    torch.manual_seed(3)
    ref_cfg = _ref_config(cfg)
    ref_pl = ref_pipeline_mod.Pipeline(ref_cfg)
    ref_pl.eval()
    state = {k: v.detach().numpy()
             for k, v in ref_pl._fusion_network.state_dict().items()}
    params, stats = convert_fusionnet_state_dict(state, params_t, stats_t,
                                                 cfg.FUSION_MODEL)
    params = jax.tree_util.tree_map(jnp.asarray, params)
    stats = jax.tree_util.tree_map(jnp.asarray, stats)

    scene = data.scenes[0]
    db.reset()
    shape = tuple(np.asarray(db.volumes[scene].num).shape)
    origin = np.asarray(db.volumes[scene].origin)
    resolution = float(np.asarray(db.volumes[scene].resolution))
    init = float(cfg.DATA.init_value)

    # the reference stores its volumes in float16 (the integrator writes
    # .half() values, modules/integrator.py:78-88 + database.py)
    ref_db = _FakeRefDatabase(
        scene,
        np.full(shape, init, np.float16),
        np.zeros(shape, np.float16),
        np.zeros(shape, np.uint8),
        np.zeros(shape, np.float16),
        origin, resolution)

    batches = [_batch(data, i) for i in range(n_frames)]

    with torch.no_grad():
        for b in batches:
            ref_pl.fuse(_torch_batch(b), ref_db, "cpu")
    ref_tsdf = ref_db.scenes_est[scene].volume.numpy()
    ref_w = ref_db.fusion_weights[scene].numpy()
    ref_ids = ref_db.ids_est[scene].volume.numpy()
    ref_scores = ref_db.scores[scene].volume.numpy()

    for b in batches:
        pipe.fuse(b, db, params, stats)
    my = db.volumes[scene]
    my_tsdf = np.asarray(my.tsdf)
    my_w = np.asarray(my.weights)
    my_ids = np.asarray(my.semantics)
    my_scores = np.asarray(my.scores)

    observed = ref_w > 0
    assert observed.sum() > 500, "scene produced too few observed voxels"

    # same touched-voxel set
    np.testing.assert_array_equal(my_w > 0, observed)
    # weights agree to the reference's per-frame float16 write-back
    np.testing.assert_allclose(my_w, ref_w, rtol=5e-3, atol=5e-3)
    # TSDF values agree on observed voxels (f16 chain tolerance)
    np.testing.assert_allclose(my_tsdf[observed], ref_tsdf[observed],
                               atol=4e-3)
    # untouched voxels keep the init value on both sides
    np.testing.assert_allclose(my_tsdf[~observed], init, atol=1e-6)
    # (the reference's f16 storage rounds the init value itself)
    np.testing.assert_allclose(ref_tsdf[~observed], init, atol=1e-4)

    # semantics: identical except racy same-score boundary duplicates
    sem_touched = ref_ids > 0
    disagree = (my_ids != ref_ids) & sem_touched
    frac = disagree.sum() / max(sem_touched.sum(), 1)
    assert frac < 0.02, f"semantic labels disagree on {frac:.1%} of voxels"
    # gt strategy -> score 1.0 wherever a label was written
    np.testing.assert_allclose(my_scores[my_ids > 0], 1.0, atol=2e-3)
    np.testing.assert_allclose(ref_scores[ref_ids > 0], 1.0, atol=2e-3)
