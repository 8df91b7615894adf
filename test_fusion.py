#!/usr/bin/env python
"""Frame-stream inference + evaluation + mesh export CLI.

Usage: python test_fusion.py --config configs/fusion/<name>.yaml

Re-implements the reference test harness (reference test_fusion.py:24-122):
stream all test frames through Pipeline.fuse, outlier-filter the volumes,
median-filter the semantic volume, print geometry (+ semantic) metric
tables, and save hdf5 volumes + ply meshes (+ semantic-colored ply).
"""

import argparse
import os

import numpy as np


def arg_parser():
    parser = argparse.ArgumentParser()
    parser.add_argument("--config", required=True)
    return vars(parser.parse_args())


def test_fusion(config):
    import jax

    from segfusion_tpu.config import get_data_config
    from segfusion_tpu.core.database import Database
    from segfusion_tpu.core.pipeline import Pipeline
    from segfusion_tpu.data import PrefetchLoader, get_data
    from segfusion_tpu.models.adapnet import SegmenterAdapter, build_adapnet
    from segfusion_tpu.utils import checkpoints as ckpt_lib
    from segfusion_tpu.utils.workspace import get_workspace

    workspace = get_workspace(config)
    test_cfg = get_data_config(config, "test")
    dataset = get_data(config.DATA.dataset, test_cfg)
    loader = PrefetchLoader(dataset,
                            batch_size=config.TESTING.test_batch_size,
                            shuffle=config.TESTING.test_shuffle,
                            num_workers=config.SETTINGS.num_workers)
    database = Database(dataset, test_cfg)

    segmenter = None
    seg_params = None
    if config.DATA.semantics and config.DATA.semantic_strategy == "predict":
        seg_model = build_adapnet(config.SEMANTIC_2D_MODEL)
        segmenter = SegmenterAdapter(seg_model, config.DATA.input)
        seg_ckpt = ckpt_lib.load_checkpoint(
            config.TESTING.semantic_2d_model_path)
        seg_params = (seg_ckpt["params"], seg_ckpt.get("batch_stats", {}))

    pipeline = Pipeline(config, segmenter=segmenter)
    params, batch_stats = pipeline.init_fusion_params(
        jax.random.PRNGKey(0), int(config.DATA.resy), int(config.DATA.resx))
    if config.TESTING.fusion_model_path:
        ck = ckpt_lib.load_checkpoint(config.TESTING.fusion_model_path)
        # strip pipeline prefixes if present (reference test_fusion.py:63-65)
        state = ckpt_lib.remove_parent(ck.get("params", ck),
                                       "_fusion_network")
        params = ckpt_lib.restore_into(params, state)
        if "batch_stats" in ck:
            batch_stats = ckpt_lib.restore_into(batch_stats,
                                                ck["batch_stats"])
        workspace.log(f"loaded fusion checkpoint "
                      f"{config.TESTING.fusion_model_path}", "test")
    else:
        workspace.log("WARNING: no fusion checkpoint given -- "
                      "running with random weights", "test")

    chunk = int(config.TESTING.get("sequence_chunk", 16) or 1)
    if chunk > 1:
        # chunked device-resident scan (one dispatch per chunk)
        pipeline.fuse_many(loader, database, params, batch_stats,
                           seg_params=seg_params, chunk=chunk)
        workspace.log(f"fused {len(dataset)} frames "
                      f"(chunked scan x{chunk})", "test")
    else:
        n = 0
        for batch in loader:
            if not np.all(np.isfinite(np.asarray(batch["extrinsics"]))):
                continue
            pipeline.fuse(batch, database, params, batch_stats,
                          seg_params=seg_params)
            n += 1
        workspace.log(f"fused {n} frames", "test")

    database.filter(value=float(config.TESTING.outlier_filter_val))
    if config.DATA.semantics:
        database.filter_semantics(5)

    eval_results, per_scene = database.evaluate("test", workspace)
    workspace.log("--- geometry metrics ---", "test")
    for k, v in eval_results.items():
        workspace.log(f"{k}: {v}", "test")
    fscore_thr = float(config.TESTING.get("fscore_threshold", 0.05) or 0.05)
    f_agg, _ = database.evaluate_fscore(threshold=fscore_thr,
                                        workspace=workspace)
    workspace.log("--- reconstruction F-score "
                  f"(tau={fscore_thr}m) ---", "test")
    for k, v in f_agg.items():
        workspace.log(f"{k}: {v}", "test")
        eval_results[f"mesh_{k}"] = v
    if config.DATA.semantics and config.DATA.get("semantic_grid"):
        sem_results, cls_iou = database.evaluate_semantics("test", workspace)
        workspace.log("--- semantic metrics ---", "test")
        for k, v in sem_results.items():
            workspace.log(f"{k}: {v}", "test")
            eval_results[f"sem_{k}"] = v

    for scene in database.scenes:
        if database.state[scene]:
            database.save(workspace.output_path,
                          save_mode=config.SETTINGS.save_mode,
                          scene_id=scene)
    workspace.log(f"artifacts saved to {workspace.output_path}", "test")
    return eval_results


if __name__ == "__main__":
    args = arg_parser()
    from segfusion_tpu.config import load_config
    config = load_config(args["config"])
    test_fusion(config)
