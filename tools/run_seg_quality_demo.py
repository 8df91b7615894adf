"""Segmentation-training quality demo (VERDICT r4 #6).

Trains configs/segmentation/synthetic_tpu_demo.yaml (stage-1 AdapNet++,
8 classes, 128x128, 3 synthetic scenes) with the real
train_segmentation.py harness, then reports val mIoU on an UNSEEN
synthetic scene (a seed the training scenes never used) for the trained
weights vs a random init -- the demonstration that the segmentation
trainer actually LEARNS, the way the reference's
train_segmentation.py:48-306 demonstrably does on Replica (whose data is
unavailable in this environment).

Run ON TPU: python tools/run_seg_quality_demo.py [--skip-train]
"""

import argparse
import copy
import glob
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))


def _val_miou(config, params, batch_stats, val_loader):
    import jax
    import jax.numpy as jnp
    import numpy as np
    import train_segmentation as TSEG
    from segfusion_tpu.models.adapnet import build_adapnet
    from segfusion_tpu.utils.metrics import RunningScore

    model = build_adapnet(config.SEMANTIC_2D_MODEL)
    in_key = config.DATA.input

    @jax.jit
    def eval_step(p, stats, x):
        outs = model.apply({"params": p, "batch_stats": stats}, x,
                           train=False)
        return jnp.argmax(outs[0], axis=-1)

    score = RunningScore(int(config.SEMANTIC_2D_MODEL.n_classes),
                         ignore_index=0)
    for batch in val_loader:
        inputs, target = TSEG.prepare_input_data(batch, config)
        pred = eval_step(params, batch_stats, inputs[in_key])
        score.update(np.asarray(target), np.asarray(pred))
    metrics, cls_iou = score.get_scores()
    return metrics


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--config",
                    default="configs/segmentation/synthetic_tpu_demo.yaml")
    ap.add_argument("--skip-train", action="store_true",
                    help="reuse the newest checkpoint under the "
                         "experiment path")
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp
    from segfusion_tpu.config import get_data_config, load_config_from_yaml
    from segfusion_tpu.data import PrefetchLoader, get_data
    from segfusion_tpu.models.adapnet import build_adapnet
    from segfusion_tpu.utils import checkpoints as ckpt_lib
    import train_segmentation as TSEG

    cfg = load_config_from_yaml(args.config)
    cfg.DATA.target_key = cfg.DATA.get("target_seg", "semantic_gt")

    # UNSEEN-scene validation: Synthetic derives per-scene layouts from
    # DATA.seed + scene index, so a seed past the training range renders
    # scenes the trained weights never saw.
    val_cfg = get_data_config(cfg, "val")
    val_cfg.seed = int(cfg.DATA.get("seed", 0)) \
        + int(cfg.DATA.get("n_scenes", 1)) + 100
    val_cfg.n_scenes = 1
    val_dataset = get_data(cfg.DATA.dataset, val_cfg)
    val_loader = PrefetchLoader(
        val_dataset, batch_size=int(cfg.TRAINING.val_batch_size),
        shuffle=False, num_workers=0)

    # random-init baseline
    model = build_adapnet(cfg.SEMANTIC_2D_MODEL)
    h, w = int(cfg.DATA.resy), int(cfg.DATA.resx)
    variables = model.init(jax.random.PRNGKey(7),
                           jnp.zeros((1, h, w, 3)), train=False)
    rand_metrics = _val_miou(cfg, variables["params"],
                             variables.get("batch_stats", {}), val_loader)
    print(f"random init: {rand_metrics}", flush=True)

    if not args.skip_train:
        TSEG.train({"comment": "seg quality demo"}, copy.deepcopy(cfg))

    pats = sorted(glob.glob(os.path.join(
        cfg.SETTINGS.experiment_path, "*", "model", "best.ckpt")))
    assert pats, f"no checkpoint under {cfg.SETTINGS.experiment_path}"
    ck = ckpt_lib.load_checkpoint(pats[-1])
    print(f"using checkpoint {pats[-1]}", flush=True)
    trained_metrics = _val_miou(cfg, ck["params"],
                                ck.get("batch_stats", {}), val_loader)
    print(f"trained: {trained_metrics}", flush=True)

    print("\n| weights | val mIoU (unseen scene) | pixel acc |")
    print("|---|---|---|")
    for label, m in (("random init", rand_metrics),
                     ("trained", trained_metrics)):
        print(f"| {label} | {m['Mean IoU']:.4f} "
              f"| {m['Acc']:.4f} |")


if __name__ == "__main__":
    main()
