#!/usr/bin/env python
"""AdapNet++ segmentation training CLI.

Usage: python train_segmentation.py --config configs/segmentation/<name>.yaml

Re-implements the reference harness (reference train_segmentation.py:48-306):
stage-1 single-modality training, stage-2 training with encoder+eASPP weights
transplanted from stage-1 rgb and tof checkpoints, random modality masking,
weighted 3-head cross-entropy (1.0/0.6/0.5), runningScore validation with
best-mIoU checkpoints.

Parallelism: instead of nn.DataParallel (reference :169-172) the train step
is jitted over a jax.sharding Mesh -- the batch is sharded across all local
devices and gradients are reduced by XLA collectives (see
segfusion_tpu/parallel/mesh.py).
"""

import argparse
import random

import numpy as np


def arg_parser():
    parser = argparse.ArgumentParser()
    parser.add_argument("--config", required=True)
    parser.add_argument("--comment", type=str, default="")
    return vars(parser.parse_args())


def prepare_input_data(batch, config):
    """Batch dict -> (inputs dict NHWC in [0,1] / meters, int labels)
    (reference train_segmentation.py:27-39)."""
    import jax.numpy as jnp
    inputs = {"image": jnp.asarray(batch["image"], jnp.float32) / 255.0}
    in_key = config.DATA.input
    if in_key != "image":
        d = jnp.asarray(batch[in_key], jnp.float32)
        inputs[in_key] = jnp.repeat(d[..., None], 3, axis=-1)
    target = jnp.asarray(batch[config.DATA.target_key]).astype(jnp.int32)
    return inputs, target


def train(args, config):
    import jax
    import jax.numpy as jnp
    import optax

    from segfusion_tpu.config import get_data_config
    from segfusion_tpu.data import PrefetchLoader, get_data
    from segfusion_tpu.models.adapnet import build_adapnet
    from segfusion_tpu.parallel.mesh import data_parallel_mesh, shard_batch
    from segfusion_tpu.utils import checkpoints as ckpt_lib
    from segfusion_tpu.utils.losses import cross_entropy
    from segfusion_tpu.utils.metrics import RunningScore
    from segfusion_tpu.utils.optim import get_optimizer
    from segfusion_tpu.utils.schedulers import get_schedule
    from segfusion_tpu.utils.workspace import get_workspace

    seed = int(config.SETTINGS.seed or 0)
    random.seed(seed)
    np.random.seed(seed)
    rng = jax.random.PRNGKey(seed)

    # multi-host (DCN) data sharding, off by default -- see
    # parallel/multihost.py for the design
    from segfusion_tpu.parallel import multihost
    multihost.initialize(config)

    config.DATA.target_key = config.DATA.get("target_seg", "semantic_gt")
    workspace = get_workspace(config)
    model_cfg = config.SEMANTIC_2D_MODEL
    stage = int(model_cfg.stage)
    in_key = config.DATA.input

    train_cfg = get_data_config(config, "train")
    val_cfg = get_data_config(config, "val")
    train_dataset = get_data(config.DATA.dataset, train_cfg)
    val_dataset = get_data(config.DATA.dataset, val_cfg)
    train_loader = PrefetchLoader(train_dataset,
                                  batch_size=config.TRAINING.train_batch_size,
                                  shuffle=config.TRAINING.train_shuffle,
                                  num_workers=config.SETTINGS.num_workers,
                                  seed=seed, drop_last=True)
    val_loader = PrefetchLoader(val_dataset,
                                batch_size=config.TRAINING.val_batch_size,
                                shuffle=False,
                                num_workers=config.SETTINGS.num_workers)

    model = build_adapnet(model_cfg)
    h, w = int(config.DATA.resy), int(config.DATA.resx)
    rng, init_rng = jax.random.split(rng)
    if stage == 1:
        variables = model.init(init_rng, jnp.zeros((1, h, w, 3)),
                               train=False)
    else:
        variables = model.init(init_rng, jnp.zeros((1, h, w, 3)),
                               jnp.zeros((1, h, w, 3)), train=False)
    params = variables["params"]
    batch_stats = variables.get("batch_stats", {})

    # stage-2 weight transplant from stage-1 checkpoints
    # (reference train_segmentation.py:95-116)
    if stage == 2 and model_cfg.get("pretrained_rgb") \
            and model_cfg.get("pretrained_tof"):
        rgb = ckpt_lib.load_checkpoint(model_cfg.pretrained_rgb)
        tof = ckpt_lib.load_checkpoint(model_cfg.pretrained_tof)
        params = dict(params)
        params["encoder_mod1"] = ckpt_lib.restore_into(
            params["encoder_mod1"], rgb["params"]["encoder_mod1"])
        params["eASPP_mod1"] = ckpt_lib.restore_into(
            params["eASPP_mod1"], rgb["params"]["eASPP"])
        params["encoder_mod2"] = ckpt_lib.restore_into(
            params["encoder_mod2"], tof["params"]["encoder_mod1"])
        params["eASPP_mod2"] = ckpt_lib.restore_into(
            params["eASPP_mod2"], tof["params"]["eASPP"])
        workspace.log("transplanted stage-1 rgb+tof encoders", "train")
    # ImageNet init: torchvision resnet50 state_dict -> encoder(s)
    # (reference modules/adapnet.py:101, resnet50(pretrained=True))
    if model_cfg.get("pretrained_encoder"):
        from segfusion_tpu.utils.torch_convert import (
            convert_resnet50_encoder, load_torch_checkpoint)
        tv_state = load_torch_checkpoint(model_cfg.pretrained_encoder)
        encoders = ("encoder_mod1",) if stage == 1 \
            else ("encoder_mod1", "encoder_mod2")
        params, batch_stats, n_arr = convert_resnet50_encoder(
            tv_state, params, batch_stats, encoders=encoders)
        workspace.log(f"imported {n_arr} ImageNet resnet50 arrays into "
                      f"{', '.join(encoders)}", "train")
    if model_cfg.get("pretrained"):
        ck = ckpt_lib.load_checkpoint(model_cfg.pretrained)
        params = ckpt_lib.restore_into(params, ck["params"])
        batch_stats = ckpt_lib.restore_into(batch_stats,
                                            ck.get("batch_stats",
                                                   batch_stats))

    schedule = get_schedule(float(config.TRAINING.optimizer.lr),
                            config.TRAINING.scheduler)
    tx = get_optimizer(config.TRAINING.optimizer, learning_rate=schedule)
    opt_state = tx.init(params)

    mesh = data_parallel_mesh()
    workspace.log(f"data-parallel over {mesh.devices.size} device(s)",
                  "train")

    loss_weights = (1.0, 0.6, 0.5)  # reference train_segmentation.py:206

    def loss_fn(p, stats, inputs, target, drng):
        variables = {"params": p, "batch_stats": stats}
        if stage == 1:
            outs, mut = model.apply(variables, inputs[in_key], train=True,
                                    rngs={"dropout": drng},
                                    mutable=["batch_stats"])
        else:
            outs, mut = model.apply(variables, inputs["image"],
                                    inputs[in_key], train=True,
                                    rngs={"dropout": drng},
                                    mutable=["batch_stats"])
        loss = sum(lw * cross_entropy(o, target, ignore_index=0)
                   for lw, o in zip(loss_weights, outs))
        return loss, mut["batch_stats"]

    @jax.jit
    def train_step(p, stats, opt_state, inputs, target, drng):
        (loss, new_stats), grads = jax.value_and_grad(
            loss_fn, has_aux=True)(p, stats, inputs, target, drng)
        updates, opt_state = tx.update(grads, opt_state, p)
        return optax.apply_updates(p, updates), new_stats, opt_state, loss

    @jax.jit
    def eval_step(p, stats, inputs):
        variables = {"params": p, "batch_stats": stats}
        if stage == 1:
            outs = model.apply(variables, inputs[in_key], train=False)
        else:
            outs = model.apply(variables, inputs["image"], inputs[in_key],
                               train=False)
        return jnp.argmax(outs[0], axis=-1)

    mask_cfg = config.TRAINING.get("optimization", {})
    best_miou = 0.0
    n_train_batches = max(len(train_loader), 1)

    for epoch in range(int(config.TRAINING.n_epochs)):
        train_loss = 0.0
        for batch in train_loader:
            inputs, target = prepare_input_data(batch, config)
            # random modality masking (reference train_segmentation.py:196-202)
            if stage == 2 and mask_cfg.get("random_mask"):
                p_mask = float(mask_cfg.get("mask_prob", 0.1))
                r = np.random.random_sample()
                if r <= p_mask:
                    inputs["image"] = jnp.zeros_like(inputs["image"])
                elif np.random.random_sample() <= p_mask:
                    inputs[in_key] = jnp.zeros_like(inputs[in_key])
            inputs = shard_batch(mesh, inputs)
            target = shard_batch(mesh, target)
            rng, drng = jax.random.split(rng)
            params, batch_stats, opt_state, loss = train_step(
                params, batch_stats, opt_state, inputs, target, drng)
            train_loss += float(loss)
        train_loss /= n_train_batches
        workspace.log(f"Epoch {epoch} Training Loss {train_loss:.5f}",
                      "train")
        workspace.add_scalar("Train/loss_t", train_loss, epoch)

        # validation (reference train_segmentation.py:230-295)
        score = RunningScore(int(model_cfg.n_classes), ignore_index=0)
        val_loss = 0.0
        for batch in val_loader:
            inputs, target = prepare_input_data(batch, config)
            pred = eval_step(params, batch_stats, inputs)
            score.update(np.asarray(target), np.asarray(pred))
        metrics, cls_iou = score.get_scores()
        for k, v in metrics.items():
            workspace.add_scalar(f"Val/{k.replace(' ', '_')}", v, epoch)
        workspace.log(f"Epoch {epoch} Val {metrics}", "val")

        if metrics["Mean IoU"] >= best_miou:
            best_miou = metrics["Mean IoU"]
            workspace.log(f"New best mIoU {best_miou:.4f} at epoch {epoch}",
                          "val")
            workspace.save_model_state(
                {"epoch": epoch + 1, "params": params,
                 "batch_stats": batch_stats, "best_miou": best_miou},
                is_best=True)
        workspace.save_model_state(
            {"epoch": epoch + 1, "params": params,
             "batch_stats": batch_stats, "opt_state": opt_state,
             "best_miou": best_miou},
            is_best=False)

    return params, batch_stats


if __name__ == "__main__":
    args = arg_parser()
    from segfusion_tpu.config import load_config
    config = load_config(args["config"])
    if "SEMANTIC_MODEL" in config:  # reference configs use this section name
        config.SEMANTIC_2D_MODEL = config.SEMANTIC_MODEL
    train(args, config)
