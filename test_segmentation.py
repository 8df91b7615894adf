#!/usr/bin/env python
"""2D segmentation evaluation CLI.

Usage: python test_segmentation.py --config configs/segmentation/<name>.yaml

Re-implements the reference harness (reference test_segmentation.py:49-164):
runningScore confusion-matrix metrics over the test set, per-class IoU
table, and input|depth|gt|est visualization strips saved as png.
"""

import argparse
import os

import numpy as np


def arg_parser():
    parser = argparse.ArgumentParser()
    parser.add_argument("--config", required=True)
    return vars(parser.parse_args())


def test(config):
    import jax
    import jax.numpy as jnp

    from segfusion_tpu.config import get_data_config
    from segfusion_tpu.data import PrefetchLoader, get_data
    from segfusion_tpu.models.adapnet import build_adapnet
    from segfusion_tpu.utils import checkpoints as ckpt_lib
    from segfusion_tpu.utils.mapping import get_mapping
    from segfusion_tpu.utils.metrics import RunningScore
    from segfusion_tpu.utils.workspace import get_workspace

    workspace = get_workspace(config)
    model_cfg = config.SEMANTIC_2D_MODEL
    stage = int(model_cfg.stage)
    in_key = config.DATA.input

    test_cfg = get_data_config(config, "test")
    dataset = get_data(config.DATA.dataset, test_cfg)
    loader = PrefetchLoader(dataset,
                            batch_size=config.TESTING.test_batch_size,
                            shuffle=False,
                            num_workers=config.SETTINGS.num_workers)

    model = build_adapnet(model_cfg)
    h, w = int(config.DATA.resy), int(config.DATA.resx)
    if stage == 1:
        variables = model.init(jax.random.PRNGKey(0),
                               jnp.zeros((1, h, w, 3)), train=False)
    else:
        variables = model.init(jax.random.PRNGKey(0),
                               jnp.zeros((1, h, w, 3)),
                               jnp.zeros((1, h, w, 3)), train=False)
    params = variables["params"]
    batch_stats = variables.get("batch_stats", {})
    ckpt_path = config.TESTING.get("semantic_2d_model_path") \
        or model_cfg.get("pretrained")
    if ckpt_path:
        ck = ckpt_lib.load_checkpoint(ckpt_path)
        params = ckpt_lib.restore_into(params, ck["params"])
        batch_stats = ckpt_lib.restore_into(
            batch_stats, ck.get("batch_stats", batch_stats))
        workspace.log(f"loaded {ckpt_path}", "test")

    @jax.jit
    def eval_step(inputs):
        v = {"params": params, "batch_stats": batch_stats}
        if stage == 1:
            outs = model.apply(v, inputs[in_key], train=False)
        else:
            outs = model.apply(v, inputs["image"], inputs[in_key],
                               train=False)
        return jnp.argmax(outs[0], axis=-1)

    score = RunningScore(int(model_cfg.n_classes), ignore_index=0)
    palette = get_mapping()
    vis_dir = os.path.join(workspace.output_path, "vis")
    os.makedirs(vis_dir, exist_ok=True)
    n_vis = int(config.TESTING.get("n_visualizations", 10))

    for i, batch in enumerate(loader):
        inputs = {"image": jnp.asarray(batch["image"], jnp.float32) / 255.0}
        if in_key != "image":
            d = jnp.asarray(batch[in_key], jnp.float32)
            inputs[in_key] = jnp.repeat(d[..., None], 3, axis=-1)
        target = np.asarray(batch["semantic_gt"])
        pred = np.asarray(eval_step(inputs))
        score.update(target, pred)

        # ScanNet-benchmark-format 2D predictions
        # (reference dataset/scannet.py:361-368, test-time output)
        if config.TESTING.get("output_benchmark") and \
                hasattr(dataset, "output_test"):
            bench_dir = os.path.join(workspace.output_path, "benchmark")
            dataset.output_test(bench_dir, batch["frame_id"][0], pred[0])

        if i < n_vis:  # input | depth | gt | est strip
            img = np.asarray(batch["image"])[0]
            img = np.clip(img - img.min(), 0, None)
            img = (img / max(img.max(), 1e-6) * 255).astype(np.uint8)
            dep = np.asarray(batch[in_key])[0] if in_key != "image" \
                else np.zeros(img.shape[:2])
            dep = (np.clip(dep / max(dep.max(), 1e-6), 0, 1)
                   * 255).astype(np.uint8)
            dep = np.stack([dep] * 3, axis=-1)
            strip = np.concatenate(
                [img, dep, palette[target[0]], palette[pred[0]]], axis=1)
            try:
                import cv2
                cv2.imwrite(os.path.join(vis_dir, f"{i:04d}.png"),
                            strip[..., ::-1])
            except Exception:
                pass

    metrics, cls_iou = score.get_scores()
    workspace.log("--- 2D segmentation metrics ---", "test")
    for k, v in metrics.items():
        workspace.log(f"{k}: {v}", "test")
    workspace.log("--- per-class IoU ---", "test")
    for c, v in cls_iou.items():
        workspace.log(f"class {c}: {v}", "test")
    return metrics


if __name__ == "__main__":
    args = arg_parser()
    from segfusion_tpu.config import load_config
    config = load_config(args["config"])
    if "SEMANTIC_MODEL" in config:
        config.SEMANTIC_2D_MODEL = config.SEMANTIC_MODEL
    test(config)
