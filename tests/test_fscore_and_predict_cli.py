"""F-score evaluation + the semantic 'predict' strategy through the full
test_fusion CLI (trained-checkpoint segmentation in the loop)."""

import os
import sys

import numpy as np
import jax
import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from segfusion_tpu.config import load_config

CFG_SEM = os.path.join(os.path.dirname(__file__), "..", "configs", "fusion",
                       "synthetic_semantic.yaml")


def test_database_fscore_on_classic_fusion(tmp_path):
    """Classic-fused synthetic scene should get a high mesh F-score vs gt."""
    import jax.numpy as jnp
    from segfusion_tpu.config import Config
    from segfusion_tpu.core.database import Database
    from segfusion_tpu.core.volume import SceneVolume
    from segfusion_tpu.data.synthetic import Synthetic
    from segfusion_tpu.ops.tsdf_fusion import tsdf_from_depth_views

    cfg = Config({"resx": 64, "resy": 64, "n_frames": 10, "n_scenes": 1,
                  "voxel_resolution": 0.08, "noise_sigma": 0.0,
                  "init_value": 0.24, "pad": 2, "seed": 0,
                  "semantics": None, "semantic_grid": False})
    data = Synthetic(cfg)
    db = Database(data, cfg)
    s = data.scenes[0]

    depths, projs = [], []
    for i in range(10):
        item = data[i]
        k = item["intrinsics"]
        w2c = np.linalg.inv(item["extrinsics"])
        projs.append((k @ w2c[:3, :4]).astype(np.float32))
        depths.append(item["depth_gt"])
    grid_shape = db.grid_shape[s]
    tsdf, weights = tsdf_from_depth_views(
        np.stack(depths), np.stack(projs), grid_shape, db.origin[s],
        db.resolution[s], 0.24)
    # write the classic result into the accumulator state
    db.volumes[s] = SceneVolume(
        num=tsdf * weights, weights=weights,
        semkey=db.volumes[s].semkey, origin=db.volumes[s].origin,
        resolution=db.volumes[s].resolution, init_value=0.24)
    db.state[s] = True

    agg, per_scene = db.evaluate_fscore(threshold=0.08)
    assert s in per_scene
    assert agg["fscore"] > 0.7, agg
    assert agg["precision"] > 0.6 and agg["recall"] > 0.6


@pytest.mark.slow
def test_test_fusion_cli_predict_strategy(tmp_path):
    """test_fusion with semantic_strategy=predict: trains nothing, but loads
    a saved AdapNet checkpoint and runs the 2D net inside the fused step."""
    import jax.numpy as jnp
    import test_fusion as test_fusion_cli
    from segfusion_tpu.models.adapnet import build_adapnet
    from segfusion_tpu.utils import checkpoints as ckpt_lib
    from segfusion_tpu.config import Config

    config = load_config(CFG_SEM)
    config.SETTINGS.experiment_path = str(tmp_path / "ws")
    config.DATA.semantic_strategy = "predict"
    config.SEMANTIC_2D_MODEL.stage = 1
    config.SEMANTIC_2D_MODEL.n_classes = 8
    h, w = int(config.DATA.resy), int(config.DATA.resx)

    seg_model = build_adapnet(config.SEMANTIC_2D_MODEL)
    variables = seg_model.init(jax.random.PRNGKey(0),
                               jnp.zeros((1, h, w, 3)), train=False)
    ckpt = str(tmp_path / "seg.ckpt")
    ckpt_lib.save_checkpoint({"params": variables["params"],
                              "batch_stats": variables.get("batch_stats",
                                                           {})}, ckpt)
    config.TESTING.semantic_2d_model_path = ckpt

    results = test_fusion_cli.test_fusion(config)
    assert np.isfinite(results["mad"])
    assert "mesh_fscore" in results
    out = os.path.join(str(tmp_path / "ws"), config.TIMESTAMP, "output")
    assert any(f.endswith("_semantic.ply") for f in os.listdir(out))
