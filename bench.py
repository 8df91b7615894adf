#!/usr/bin/env python
"""Benchmark: online joint depth-fusion + semantics throughput.

Default mode (the driver's headline; prints ONE JSON line) measures the
flagship per-frame pipeline step -- extraction (9-point trilinear ray
sampling), FusionNet v3 with semantic head (growth_factor 6, the paper's
accuracy model, reference configs/fusion/replica_accuracy.yaml), TSDF
scatter integration AND semantic label/score volume integration -- as ONE
jitted XLA program over a device-resident 1cm-voxel scene volume, on one
TPU chip, at 256x256 depth over a 448^3 volume.

Baseline: the reference runs this config at 10 fps on a CPU+GPU split
(README.md:6, 256x256 joint fusion+semantics). The driver's north star is
>=37 fps (the reference's 128x128 no-semantics speed-model figure, demanded
here at 256x256 WITH semantics). vs_baseline = fps / 10.

`--mode multi512` (BASELINE.json config #5): 2 scenes streamed
simultaneously at 512x512 depth through the scene-parallel vmapped
fuse_sequence -- the whole multi-scene stream is ONE dispatch. Aggregate
fps across scenes; vs_baseline against the reference's throughput
ray-scaled to 512^2 (10 fps x (256/512)^2 = 2.5 fps).

Each mode prints one JSON line: {"metric", "value", "unit", "vs_baseline"}.
"""

import argparse
import json
import sys
import time

import numpy as np


def note(msg):
    print(msg, file=sys.stderr, flush=True)


def build_config(h, w):
    from segfusion_tpu.config import Config, _DEFAULTS, _merge_defaults

    cfg = _merge_defaults(Config({}), _DEFAULTS)
    cfg.DATA.resx = w
    cfg.DATA.resy = h
    cfg.DATA.init_value = 0.1
    cfg.DATA.semantics = "class30"
    cfg.DATA.semantic_strategy = "predict"  # AdapNet++ in the loop, like
                                            # the reference's joint mode
    cfg.FUSION_MODEL.name = "v3"
    cfg.FUSION_MODEL.n_points = 9
    cfg.FUSION_MODEL.n_tail_points = 7
    cfg.FUSION_MODEL.growth_factor = 6  # accuracy model
    cfg.FUSION_MODEL.use_semantics = True
    cfg.FUSION_MODEL.compute_dtype = "bfloat16"  # MXU path
    cfg.SEMANTIC_2D_MODEL.n_classes = 30
    cfg.SEMANTIC_2D_MODEL.stage = 2          # RGB+depth fusion AdapNet
    cfg.SEMANTIC_2D_MODEL.compute_dtype = "bfloat16"
    return cfg


def build_pipeline(cfg, h, w):
    import jax
    import jax.numpy as jnp

    from segfusion_tpu.core.pipeline import Pipeline
    from segfusion_tpu.models.adapnet import SegmenterAdapter, build_adapnet

    seg_model = build_adapnet(cfg.SEMANTIC_2D_MODEL)
    seg_vars = seg_model.init(jax.random.PRNGKey(1),
                              jnp.zeros((1, h, w, 3)),
                              jnp.zeros((1, h, w, 3)), train=False)
    seg_params = (seg_vars["params"], seg_vars.get("batch_stats", {}))
    segmenter = SegmenterAdapter(seg_model, "tof_depth")

    pipe = Pipeline(cfg, segmenter=segmenter)
    params, stats = pipe.init_fusion_params(jax.random.PRNGKey(0), h, w)
    return pipe, (params, stats), seg_params


def render_frames(scene, h, w, n_frames):
    """Pre-render a depth trajectory at the bench resolution (one vmapped
    call -- per-call dispatch through the tunnel is expensive)."""
    import jax
    import jax.numpy as jnp

    from segfusion_tpu.ops.raycast import render_depth

    coarse, _ = scene.grid(0.04, 10.0, pad=2)
    f = 0.5 * w
    intr = jnp.asarray([[f, 0, w / 2], [0, f, h / 2], [0, 0, 1]],
                       jnp.float32)
    poses = jnp.asarray(scene.camera_poses(n_frames))
    gvol = jnp.asarray(coarse.volume)
    gorg = jnp.asarray(coarse.origin)
    depths = jax.jit(jax.vmap(
        lambda p: render_depth(gvol, p, intr, gorg, coarse.resolution,
                               h, w, near=0.05, far=9.0, n_steps=192)
    ))(poses)
    gray = jnp.clip(1.0 - depths / 9.0, 0, 1) * 255.0
    return {
        "depth": depths,
        "depth_input": depths,
        "image": jnp.repeat(gray[..., None], 3, axis=-1),
        "extrinsics": poses,
        "intrinsics": jnp.broadcast_to(intr, (n_frames, 3, 3)),
        "mask": depths > 0,
    }


def bench_headline():
    import jax
    import jax.numpy as jnp

    from segfusion_tpu.core.volume import init_scene_volume
    from segfusion_tpu.data.synthetic import SyntheticScene

    h = w = 256
    cfg = build_config(h, w)
    pipe, params_stats, seg_params = build_pipeline(cfg, h, w)

    # Replica-room-scale volume: ~4.5m box at 1cm voxels
    scene = SyntheticScene(seed=0, half=2.2)
    vshape = (448, 448, 448)
    origin = np.array([-2.24, -2.24, -2.24], np.float32)
    volume = init_scene_volume(vshape, origin, 0.01, cfg.DATA.init_value)

    note("bench: rendering trajectory...")
    frames = render_frames(scene, h, w, 8)
    note("bench: frames ready")

    # Stack the rendered trajectory to a (T, ...) frame batch and fuse the
    # whole stream in ONE lax.scan program (single host dispatch; the
    # volume state never leaves HBM). NOTE: on the tunneled axon backend
    # block_until_ready does not synchronize; a scalar reduction + 4-byte
    # readback forces completion of the chain.
    n_iters = 32
    reps = n_iters // 8
    stacked = jax.tree_util.tree_map(
        lambda x: jnp.concatenate([x] * reps, axis=0), frames)
    sum_w = jax.jit(lambda v: jnp.sum(v.weights))

    run_seq = pipe.fuse_sequence
    note("bench: compiling fused scan step...")
    volume = run_seq(params_stats, volume, stacked, seg_params)
    float(sum_w(volume))
    note("bench: warmup done, timing...")

    t0 = time.perf_counter()
    volume = run_seq(params_stats, volume, stacked, seg_params)
    float(sum_w(volume))
    dt = time.perf_counter() - t0
    fps = n_iters / dt

    print(json.dumps({
        "metric": "joint fusion+semantics throughput, 256x256 depth, "
                  "AdapNet++ stage-2 predict + FusionNet v3 gf6 + 448^3 "
                  "1cm volume, 1 TPU chip",
        "value": round(fps, 2),
        "unit": "frames/sec",
        "vs_baseline": round(fps / 10.0, 2),
    }))


def bench_speed():
    """Reference speed-model config (configs/fusion/replica_speed.yaml:
    128x128 depth, FusionNet v3 gf6, use_semantics False, 'efficient'
    device-resident volumes -- the README's 37 fps headline): same scene
    scale as the headline bench (448^3 at 1cm), no segmentation net, no
    semantic volume updates."""
    import jax
    import jax.numpy as jnp

    from segfusion_tpu.core.pipeline import Pipeline
    from segfusion_tpu.core.volume import init_scene_volume
    from segfusion_tpu.data.synthetic import SyntheticScene

    h = w = 128
    cfg = build_config(h, w)
    cfg.DATA.semantics = None
    cfg.DATA.semantic_strategy = "gt"
    cfg.FUSION_MODEL.use_semantics = False
    pipe = Pipeline(cfg)
    params, stats = pipe.init_fusion_params(jax.random.PRNGKey(0), h, w)

    scene = SyntheticScene(seed=0, half=2.2)
    vshape = (448, 448, 448)
    origin = np.array([-2.24, -2.24, -2.24], np.float32)
    volume = init_scene_volume(vshape, origin, 0.01, cfg.DATA.init_value)

    note("bench: rendering trajectory...")
    frames = render_frames(scene, h, w, 8)
    frames = {k: frames[k] for k in
              ("depth", "extrinsics", "intrinsics", "mask")}
    note("bench: frames ready")

    n_iters = 64
    stacked = jax.tree_util.tree_map(
        lambda x: jnp.concatenate([x] * (n_iters // 8), axis=0), frames)
    sum_w = jax.jit(lambda v: jnp.sum(v.weights))

    note("bench: compiling fused scan step...")
    volume = pipe.fuse_sequence((params, stats), volume, stacked, None)
    float(sum_w(volume))
    note("bench: warmup done, timing...")

    t0 = time.perf_counter()
    volume = pipe.fuse_sequence((params, stats), volume, stacked, None)
    float(sum_w(volume))
    dt = time.perf_counter() - t0
    fps = n_iters / dt

    print(json.dumps({
        "metric": "depth-fusion throughput (speed model), 128x128 depth, "
                  "FusionNet v3 gf6 no semantics + 448^3 1cm volume, "
                  "1 TPU chip (reference README: 37 fps on GPU)",
        "value": round(fps, 2),
        "unit": "frames/sec",
        "vs_baseline": round(fps / 37.0, 2),
    }))


def bench_multi512():
    """BASELINE.json config #5: high-res 512x512 multi-scene streaming."""
    import jax
    import jax.numpy as jnp

    from segfusion_tpu.core.volume import init_scene_volume
    from segfusion_tpu.data.synthetic import SyntheticScene
    from segfusion_tpu.parallel.scene_parallel import (SceneParallelFusion,
                                                       stack_volumes)

    h = w = 512
    n_scenes = 2
    cfg = build_config(h, w)
    pipe, params_stats, seg_params = build_pipeline(cfg, h, w)

    vshape = (320, 320, 320)   # two 3.2m scenes at 1cm share the chip
    origin = np.array([-1.6, -1.6, -1.6], np.float32)
    volumes = stack_volumes([
        init_scene_volume(vshape, origin, 0.01, cfg.DATA.init_value)
        for _ in range(n_scenes)])

    note("bench: rendering trajectories...")
    per_scene = [render_frames(SyntheticScene(seed=s, half=1.5), h, w, 8)
                 for s in range(n_scenes)]
    frames = jax.tree_util.tree_map(
        lambda *xs: jnp.stack(xs), *per_scene)     # (S, T, ...)
    reps = 2
    frames = jax.tree_util.tree_map(
        lambda x: jnp.concatenate([x] * reps, axis=1), frames)
    n_frames_total = n_scenes * 8 * reps
    note("bench: frames ready")

    runner = SceneParallelFusion(pipe)
    volumes = runner.shard_volumes(volumes)
    sum_w = jax.jit(lambda v: jnp.sum(v.weights))

    note("bench: compiling vmapped scene scan...")
    volumes = runner.run_sequences(params_stats, volumes, frames,
                                   seg_params)
    float(sum_w(volumes))
    note("bench: warmup done, timing...")

    t0 = time.perf_counter()
    volumes = runner.run_sequences(params_stats, volumes, frames,
                                   seg_params)
    float(sum_w(volumes))
    dt = time.perf_counter() - t0
    fps = n_frames_total / dt

    print(json.dumps({
        "metric": "multi-scene joint fusion+semantics, 2 scenes x 512x512 "
                  "depth, AdapNet++ stage-2 + FusionNet v3 gf6 + 320^3 1cm "
                  "volumes, aggregate fps, 1 TPU chip (baseline: reference "
                  "10 fps ray-scaled to 512^2 = 2.5)",
        "value": round(fps, 2),
        "unit": "frames/sec",
        "vs_baseline": round(fps / 2.5, 2),
    }))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--mode", choices=["headline", "speed", "multi512"],
                    default="headline")
    args = ap.parse_args()
    if args.mode == "headline":
        bench_headline()
    elif args.mode == "speed":
        bench_speed()
    else:
        bench_multi512()


if __name__ == "__main__":
    main()
