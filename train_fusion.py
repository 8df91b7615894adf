#!/usr/bin/env python
"""Online-fusion training CLI.

Usage: python train_fusion.py --config configs/fusion/<name>.yaml [--comment]

Re-implements the reference harness (reference train_fusion.py:35-256) on the
TPU-native pipeline: per-frame fuse_training steps with gradient accumulation
(optax.MultiSteps), global-norm clipping, poly LR schedule, trajectory /
random volume resets, periodic train/val evaluation with best/last
checkpoints and TensorBoard scalars.
"""

import argparse
import random

import numpy as np


def arg_parser():
    parser = argparse.ArgumentParser()
    parser.add_argument("--config", required=True)
    parser.add_argument("--comment", type=str, default="")
    return vars(parser.parse_args())


def train_fusion(args, config):
    import jax
    import optax

    from segfusion_tpu.config import get_data_config
    from segfusion_tpu.core.database import Database
    from segfusion_tpu.core.pipeline import Pipeline
    from segfusion_tpu.data import PrefetchLoader, get_data
    from segfusion_tpu.models.adapnet import SegmenterAdapter, build_adapnet
    from segfusion_tpu.utils import checkpoints as ckpt_lib
    from segfusion_tpu.utils.optim import get_optimizer
    from segfusion_tpu.utils.schedulers import get_schedule
    from segfusion_tpu.utils.workspace import get_workspace

    seed = int(config.SETTINGS.seed or 0)
    random.seed(seed)
    np.random.seed(seed)
    rng = jax.random.PRNGKey(seed)

    # multi-host (DCN) scene sharding, off by default -- see
    # parallel/multihost.py for the design
    from segfusion_tpu.parallel import multihost
    multihost.initialize(config)

    workspace = get_workspace(config)
    workspace.log(f"comment: {args.get('comment', '')}", "train")

    train_cfg = get_data_config(config, "train")
    val_cfg = get_data_config(config, "val")
    train_dataset = get_data(config.DATA.dataset, train_cfg)
    val_dataset = get_data(config.DATA.dataset, val_cfg)
    train_loader = PrefetchLoader(train_dataset,
                                  batch_size=config.TRAINING.train_batch_size,
                                  shuffle=config.TRAINING.train_shuffle,
                                  num_workers=config.SETTINGS.num_workers,
                                  seed=seed)
    val_loader = PrefetchLoader(val_dataset,
                                batch_size=config.TRAINING.val_batch_size,
                                shuffle=config.TRAINING.val_shuffle,
                                num_workers=config.SETTINGS.num_workers)

    train_database = Database(train_dataset, train_cfg)
    val_database = Database(val_dataset, val_cfg)

    # segmentation network for semantic_strategy == 'predict'
    segmenter = None
    seg_params = None
    if config.DATA.semantics and config.DATA.semantic_strategy == "predict":
        seg_model = build_adapnet(config.SEMANTIC_2D_MODEL)
        segmenter = SegmenterAdapter(seg_model, config.DATA.input)
        seg_ckpt = ckpt_lib.load_checkpoint(
            config.TESTING.semantic_2d_model_path)
        seg_params = (seg_ckpt["params"], seg_ckpt.get("batch_stats", {}))

    pipeline = Pipeline(config, segmenter=segmenter)
    rng, init_rng = jax.random.split(rng)
    params, batch_stats = pipeline.init_fusion_params(
        init_rng, int(config.DATA.resy), int(config.DATA.resx))
    if config.FUSION_MODEL.pretrained:
        pre = ckpt_lib.load_checkpoint(config.FUSION_MODEL.pretrained)
        params = ckpt_lib.restore_into(params, pre["params"])
        batch_stats = ckpt_lib.restore_into(batch_stats,
                                            pre.get("batch_stats",
                                                    batch_stats))

    n_params = sum(int(np.prod(p.shape))
                   for p in jax.tree_util.tree_leaves(params))
    workspace.log(f"Fusion Parameters: {n_params}", "train")

    # optimizer: clip -> optimizer(schedule), accumulated over k steps
    # (reference train_fusion.py:182-189). In sequence mode (default) the
    # accumulation happens inside one scanned device program with SUMMED
    # grads (torch .backward() semantics); otherwise optax.MultiSteps.
    schedule = get_schedule(float(config.TRAINING.optimizer.lr),
                            config.TRAINING.scheduler)
    tx = get_optimizer(config.TRAINING.optimizer, learning_rate=schedule)
    if config.TRAINING.optimization.clipping:
        tx = optax.chain(optax.clip_by_global_norm(1.0), tx)
    accum = int(config.TRAINING.optimization.accumulation_steps or 1)
    use_sequence = bool(config.TRAINING.optimization.get("use_sequence",
                                                         True))
    if accum > 1 and not use_sequence:
        tx = optax.MultiSteps(tx, every_k_schedule=accum)
    opt_state = tx.init(params)

    @jax.jit
    def apply_updates(params, opt_state, grads):
        updates, opt_state = tx.update(grads, opt_state, params)
        return optax.apply_updates(params, updates), opt_state

    start_epoch = 0
    best_iou = 0.0
    if config.TRAINING.resume:
        ck = ckpt_lib.load_checkpoint(config.TRAINING.resume)
        params = ckpt_lib.restore_into(params, ck["params"])
        batch_stats = ckpt_lib.restore_into(batch_stats, ck["batch_stats"])
        opt_state = ckpt_lib.restore_into(opt_state, ck["opt_state"])
        start_epoch = int(ck.get("epoch", 0))
        best_iou = float(ck.get("best_iou", 0.0))
        workspace.log(f"resumed from {config.TRAINING.resume} "
                      f"at epoch {start_epoch}", "train")

    n_batches = len(train_loader)
    eval_freq = int(config.SETTINGS.eval_freq)
    log_freq = int(config.SETTINGS.log_freq)
    reset_cfg = config.TRAINING.optimization

    # row-carry: per-scene slot state + packed gt shadow cached across
    # chunks (the canonical<->slot conversions cost ~130 ms per chunk at
    # 448^3; with carrying they're paid once per scene + at evals)
    from segfusion_tpu.ops import rowvol as _rowvol
    rowstate = {}
    gt_shadows = {}

    def train_rowstate(scene_id):
        if scene_id not in rowstate:
            vol = train_database.volumes[scene_id]
            layout = _rowvol.RowLayout.for_shape(tuple(vol.num.shape))
            rowstate[scene_id] = (layout, pipeline._new_stream(
                layout, pipeline._enter_rows(layout, vol)))
            if scene_id not in gt_shadows:
                gt_shadows[scene_id] = pipeline._gt_shadow(
                    layout, train_database.scenes_gt[scene_id])
        return rowstate[scene_id]

    def materialize_rowstate():
        """Reflect carried row states into the database (kept carrying)."""
        for sid, (layout, stream) in rowstate.items():
            train_database.update(sid,
                                  pipeline._peek_rows(layout, stream.rv))

    for epoch in range(start_epoch, int(config.TRAINING.n_epochs)):
        workspace.log(
            f"Training epoch {epoch}/{config.TRAINING.n_epochs}", "train")
        train_database.reset()
        val_database.reset()
        rowstate.clear()
        train_loss = 0.0

        import jax.numpy as jnp
        chunk_frames = []
        chunk_resets = []
        chunk_scene = None

        def reset_flag_for(batch, i):
            frame_id = batch["frame_id"][0]
            scene_id = frame_id.split("/", 1)[0]
            flag = False
            # new-trajectory reset under hybrid loading
            # (reference train_fusion.py:154-157)
            if (frame_id.rsplit("/", 1)[-1] == "0"
                    and config.DATA.data_load_strategy == "hybrid"):
                flag = True
            # random reset (reference train_fusion.py:159-163)
            if reset_cfg.reset_strategy and \
                    np.random.random_sample() <= reset_cfg.reset_prob:
                workspace.log(f"Random reset of scene {scene_id} "
                              f"at step {i}", "train")
                flag = True
            return flag

        def flush_chunk():
            """Run one accumulated train_sequence chunk + optimizer step."""
            nonlocal params, opt_state, batch_stats, train_loss
            nonlocal chunk_frames, chunk_resets, chunk_scene, rng
            if not chunk_frames:
                return
            n = len(chunk_frames)
            frames = list(chunk_frames)
            resets = list(chunk_resets)
            if n < accum:  # pad with no-op frames (mask False -> 0 grads)
                pad = dict(frames[-1])
                pad["mask"] = jnp.zeros_like(frames[-1]["mask"])
                frames += [pad] * (accum - n)
                resets += [False] * (accum - n)
            stacked = jax.tree_util.tree_map(
                lambda *xs: jnp.stack(xs), *frames)
            rng, sub = jax.random.split(rng)
            rngs = jax.random.split(sub, accum)
            if pipeline.row_path:
                layout, stream = train_rowstate(chunk_scene)
                loss_sum, grads, stream, batch_stats = \
                    pipeline.train_sequence_rows(
                        layout, params, batch_stats, stream,
                        gt_shadows[chunk_scene], stacked, seg_params,
                        rngs, jnp.asarray(resets))
                rowstate[chunk_scene] = (layout, stream)
            else:
                volume = train_database.volumes[chunk_scene]
                gt = train_database.scenes_gt[chunk_scene]
                loss_sum, grads, new_volume, batch_stats = \
                    pipeline.train_sequence(params, batch_stats, volume,
                                            gt, stacked, seg_params, rngs,
                                            jnp.asarray(resets))
                train_database.update(chunk_scene, new_volume)
            params, opt_state = apply_updates(params, opt_state, grads)
            train_loss += float(loss_sum)
            chunk_frames = []
            chunk_resets = []

        for i, batch in enumerate(train_loader):
            if not np.all(np.isfinite(np.asarray(batch["extrinsics"]))):
                continue

            frame_id = batch["frame_id"][0]
            scene_id = frame_id.split("/", 1)[0]

            if use_sequence:
                if chunk_scene is not None and scene_id != chunk_scene:
                    flush_chunk()
                chunk_scene = scene_id
                chunk_frames.append(pipeline._frame_from_batch(
                    batch, config.DATA.input))
                chunk_resets.append(reset_flag_for(batch, i))
                if len(chunk_frames) == accum:
                    flush_chunk()
            else:
                if reset_flag_for(batch, i):
                    train_database.reset(scene_id)
                rng, step_rng = jax.random.split(rng)
                loss, grads, batch_stats = pipeline.fuse_training(
                    batch, train_database, params, batch_stats,
                    seg_params=seg_params, rng=step_rng)
                params, opt_state = apply_updates(params, opt_state, grads)
                train_loss += float(loss)

            if (i + 1) % log_freq == 0:
                workspace.add_scalar("Train/loss", train_loss / log_freq,
                                     i + 1 + epoch * n_batches)
                workspace.log(f"step {i + 1}: loss "
                              f"{train_loss / log_freq:.6f}", "train")
                train_loss = 0.0

            if (i + 1) % eval_freq == 0 or i == n_batches - 1:
                if use_sequence:
                    flush_chunk()  # apply pending grads before evaluating
                    materialize_rowstate()
                step = i + 1 + epoch * n_batches
                train_eval = train_database.evaluate("train", workspace)
                for k in ("mse", "acc", "iou", "mad"):
                    workspace.add_scalar(f"Train/{k}", train_eval.get(k, 0),
                                         step)

                val_database.reset()
                # chunked streaming (row-carried, host-IO overlapped)
                pipeline.fuse_many(val_loader, val_database, params,
                                   batch_stats, seg_params=seg_params)
                val_database.filter(value=0.5)
                val_eval = val_database.evaluate("val", workspace)
                for k in ("mse", "acc", "iou", "mad"):
                    workspace.add_scalar(f"Val/{k}", val_eval.get(k, 0),
                                         step)

                score = (val_eval.get("iou", 0) + val_eval.get("acc", 0)) / 2
                if score >= best_iou:
                    best_iou = score
                    workspace.log(f"Found new best model with score "
                                  f"{best_iou:.4f} at epoch {epoch}", "val")
                    val_database.save_to_workspace(
                        workspace, mode="best_val",
                        save_mode=config.SETTINGS.save_mode)
                    workspace.save_model_state(
                        {"epoch": epoch + 1, "params": params,
                         "batch_stats": batch_stats, "best_iou": best_iou},
                        is_best=True)

                val_database.save_to_workspace(
                    workspace, mode="latest_val",
                    save_mode=config.SETTINGS.save_mode)
                workspace.save_model_state(
                    {"epoch": epoch + 1, "params": params,
                     "batch_stats": batch_stats, "opt_state": opt_state,
                     "best_iou": best_iou},
                    is_best=False)

    return params, batch_stats


if __name__ == "__main__":
    args = arg_parser()
    from segfusion_tpu.config import load_config
    config = load_config(args["config"])
    train_fusion(args, config)
