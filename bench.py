#!/usr/bin/env python
"""Benchmark: online joint depth-fusion + semantics throughput.

The default run measures EVERY recorded mode and prints one JSON line
per mode -- {"metric", "value", "unit", "vs_baseline"}. The headline
mode runs FIRST and its line is re-emitted after each secondary mode, so
the FINAL stdout line is always the headline (parsers that read the last
line get it even if the run is killed mid-mode); the full set rides in
the artifact tail. SEGFUSION_BENCH_BUDGET (seconds, default 2400) bounds
the wall clock: secondaries that would not fit are skipped, and a
watchdog thread hard-exits at the deadline (re-emitting the headline,
rc 0) so an overrunning compile can never push the process into the
driver's external timeout.

Disclosure: modes that run with an approximation enabled (frame_block
staleness, semantic-integration decimation, bf16 geo accumulators) name
it in the metric string; the speed mode also measures and emits the
exact per-frame recurrence (exact_recurrence_fps) in the same JSON line.

Modes:
  headline  flagship per-frame pipeline step -- extraction (9-point
            trilinear ray sampling), AdapNet++ stage-2 prediction,
            FusionNet v3 with semantic head (growth_factor 6, the
            paper's accuracy model, reference
            configs/fusion/replica_accuracy.yaml), TSDF scatter
            integration AND semantic label/score volume integration --
            as ONE jitted XLA program over a device-resident 1cm-voxel
            448^3 scene volume, one TPU chip, 256x256 depth. Baseline:
            the reference runs this config at 10 fps on a CPU+GPU split
            (README.md:6); north star >= 37. vs_baseline = fps / 10.
  speed     the reference's 37 fps speed-model config
            (configs/fusion/replica_speed.yaml): 128x128 depth,
            FusionNet v3, no semantics, device-resident volumes.
            vs_baseline = fps / 37.
  multi512  BASELINE.json config #5: 2 scenes streamed simultaneously at
            512x512 through the scene-parallel vmapped fuse_sequence
            (the whole multi-scene stream is ONE dispatch). Aggregate
            fps; baseline = reference 10 fps ray-scaled to 512^2 = 2.5.
  train     online-learning throughput (reference train_fusion.py hot
            loop at the accuracy config): per-frame FusionNet
            forward+backward + gt-target extraction + volume
            integration, scanned with summed grad accumulation
            (train_sequence, row path). The reference has no published
            training fps; vs_baseline is against its 10 fps ONLINE
            joint rate as the nominal per-frame budget.

Measurement notes: per-call dispatch through the axon relay is 25-50 ms,
so every mode times one fused multi-frame program; block_until_ready does
not synchronize here -- a scalar jnp.sum readback forces completion.
"""

import argparse
import json
import os
import sys
import time

import numpy as np

# SEGFUSION_BENCH_TINY=1 shrinks every mode to CPU-smoke shapes so the
# whole driver artifact path (mode wiring, RowStream carry, exits, JSON
# emission) is testable without a TPU (tests/test_bench_smoke.py). The
# numbers it prints are meaningless; it exists to guarantee `python
# bench.py` cannot crash at round end.
_TINY = bool(os.environ.get("SEGFUSION_BENCH_TINY"))


def note(msg):
    print(msg, file=sys.stderr, flush=True)


# wall-clock deadline for the all-modes run (set by main() from
# SEGFUSION_BENCH_BUDGET); single-mode runs have none.
_DEADLINE = None

# cached headline JSON line, re-emitted by the watchdog on forced exit
_HEADLINE_LINE = None


def _time_left():
    if _DEADLINE is None:
        return float("inf")
    return _DEADLINE - time.monotonic()


def _arm_watchdog(seconds):
    """Backstop for the budget: the skip logic only decides BEFORE a mode
    starts, so a secondary whose compile overruns its estimate can blow
    past the budget and hit the driver's external timeout (rc=124 --
    exactly how round 4 lost its headline, BENCH_r04.json). At the
    deadline this daemon re-emits the cached headline line and exits 0;
    if the headline itself never finished there is nothing worth saving
    and it exits 3 (same information as the external kill, but
    self-inflicted and with a clean rc)."""
    import threading

    def fire():
        if _HEADLINE_LINE is not None:
            print(_HEADLINE_LINE, flush=True)
            note("bench: watchdog deadline hit; exiting with the cached "
                 "headline as the final line")
            os._exit(0)
        note("bench: watchdog deadline hit before the headline finished")
        os._exit(3)

    t = threading.Timer(seconds, fire)
    t.daemon = True
    t.start()
    return t


def build_config(h, w):
    from segfusion_tpu.config import Config, _DEFAULTS, _merge_defaults

    cfg = _merge_defaults(Config({}), _DEFAULTS)
    # emergency escape hatch for the driver run: the fused matmul net
    # executor defaults on for bf16 configs; SEGFUSION_FUSED_NET=off
    # forces the Flax conv forward (main() retries a failed mode once
    # with it)
    if os.environ.get("SEGFUSION_FUSED_NET"):
        cfg.SETTINGS.fused_net = os.environ["SEGFUSION_FUSED_NET"]
    # batched segmenter pre-pass over the frame chunk (on by default);
    # SEGFUSION_SEM_PREPASS=off A/Bs the per-frame forward, _BATCH sizes it
    if os.environ.get("SEGFUSION_SEM_PREPASS"):
        cfg.SETTINGS.sem_prepass = os.environ["SEGFUSION_SEM_PREPASS"]
    if os.environ.get("SEGFUSION_SEM_PREPASS_BATCH"):
        cfg.SETTINGS.sem_prepass_batch = int(
            os.environ["SEGFUSION_SEM_PREPASS_BATCH"])
    # dirty-shadow carry (incremental tile rebuild); =off forces a full
    # shadow rebuild per frame -- the round-4 escape hatch for the carry
    # path (its custom_vmap rule regression killed multi512 in round 3)
    if os.environ.get("SEGFUSION_DIRTY_SHADOW"):
        cfg.SETTINGS.dirty_shadow = os.environ["SEGFUSION_DIRTY_SHADOW"]
    # semantic-integration decimation (key scatter every k-th frame);
    # default 1 = exact reference parity. A/B knob for the headline
    # (SEGFUSION_SEM_EVERY=4 skips ~3/4 of the ~22 ms key scatter).
    if os.environ.get("SEGFUSION_SEM_EVERY"):
        cfg.SETTINGS.sem_integrate_every = int(
            os.environ["SEGFUSION_SEM_EVERY"])
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


def _headline_setup(h=256, w=256):
    import jax
    import jax.numpy as jnp

    from segfusion_tpu.core.volume import init_scene_volume
    from segfusion_tpu.data.synthetic import SyntheticScene

    if _TINY:
        h = w = 32
    cfg = build_config(h, w)
    # measured round-4 default (tools/probe_frame_block.py headline
    # sweep: 11.72 / 13.58 / 14.30 / 13.80 / 13.55 fps at k=1/2/4/8/16
    # -- the knee is k=4; larger blocks pay HBM pressure on the ~0.5 GB
    # per-frame update intermediates). Quality cost: none measurable
    # (tools/probe_block_quality.py). SEGFUSION_FRAME_BLOCK=1 retry rung
    # restores the exact per-frame recurrence.
    cfg.SETTINGS.frame_block = 4
    # round-5 measured defaults (tools/probe_frame_block.py headline
    # (k x sem_every) sweep, one TPU window: 17.48 @ k4/sem4, 17.00 @
    # k8/sem4, 18.18 @ k4/sem8) -- bf16 geo accumulators + semantic
    # integration every 8th frame. Quality on the 300-frame high-overlap
    # orbit (tools/probe_block_quality.py table in PERFORMANCE.md):
    # geometry IMPROVES with frame_block (IoU 0.724 -> 0.743 at k=4) and
    # sem_every=8 nudges sem mIoU UP (0.3599 vs 0.3564 exact -- fewer
    # stale-extraction key votes). Every approximation is named in the
    # emitted metric string; the SEGFUSION_GEO_DTYPE / SEGFUSION_SEM_EVERY
    # envs override (and the retry ladder restores float32 / exact
    # semantics on failure).
    cfg.SETTINGS.geo_dtype = "bfloat16"
    if not os.environ.get("SEGFUSION_SEM_EVERY"):
        cfg.SETTINGS.sem_integrate_every = 8
    pipe, params_stats, seg_params = build_pipeline(cfg, h, w)

    # Replica-room-scale volume: ~4.5m box at 1cm voxels
    scene = SyntheticScene(seed=0, half=2.2)
    vshape = (64,) * 3 if _TINY else (448, 448, 448)
    origin = np.array([-2.24, -2.24, -2.24], np.float32)
    volume = init_scene_volume(vshape, origin, 4.48 / vshape[0],
                               cfg.DATA.init_value)

    note("bench: rendering trajectory...")
    frames = render_frames(scene, h, w, 4 if _TINY else 8)
    note("bench: frames ready")
    return cfg, pipe, params_stats, seg_params, volume, frames


def _free_buffers(tree):
    """Eagerly release a pytree's device buffers (donation through the
    axon relay is often reported 'not usable', so dead state must be
    dropped by hand between phases to stay inside the 16 GB chip)."""
    import jax

    for leaf in jax.tree_util.tree_leaves(tree):
        if isinstance(leaf, jax.Array) and not leaf.is_deleted():
            leaf.delete()


def _stream_rows(pipe, params_stats, volume, frames, seg_params,
                 chunk_frames=32, n_chunks=2):
    if _TINY:
        chunk_frames, n_chunks = 4, 1
    """Time the fuse_many steady state: row-carried chunked streaming --
    per-chunk fuse_sequence_rows dispatches chained on the slot state,
    ONE exit materialisation at the end (how every multi-chunk stream
    runs; the entry conversion is once per scene and done in warmup).
    Returns (fps, volume)."""
    import jax
    import jax.numpy as jnp
    from segfusion_tpu.ops import rowvol

    reps = chunk_frames // next(iter(frames.values())).shape[0]
    stacked = jax.tree_util.tree_map(
        lambda x: jnp.concatenate([x] * reps, axis=0), frames)
    sum_w = jax.jit(lambda v: jnp.sum(v.weights))

    def enter(volume):
        """Enter rows and CONSUME the canonical volume (the bench never
        reads it again before exit; keeping it alive costs 1.1 GB at
        448^3 next to the carried slot+shadow state)."""
        stream = pipe._new_stream(layout, pipe._enter_rows(layout, volume))
        # force completion with a scalar readback -- block_until_ready
        # does NOT synchronize through the relay (CLAUDE.md), and the
        # conversion must be done before its inputs are freed
        float(jnp.sum(stream.rv.geo[0]))
        for buf in (volume.num, volume.weights, volume.semkey):
            buf.delete()
        return stream

    layout = rowvol.RowLayout.for_shape(tuple(volume.num.shape))
    stream = enter(volume)
    note("bench: compiling fused scan step...")
    stream = pipe.fuse_sequence_rows(layout, params_stats, stream, stacked,
                                     seg_params)
    volume = pipe._exit_rows(layout, pipe._drop_carry(stream))
    float(sum_w(volume))
    # geo/key were donated into the exit; the shadow carry (1.4 GB at
    # 448^3) is NOT -- free it before enter() builds a fresh stream, or
    # the warmup and timing streams coexist (OOM margin on a 16 GB chip,
    # especially at frame_block > 1 where block intermediates are larger)
    _free_buffers(stream)
    note("bench: warmup done, timing...")

    stream = enter(volume)
    t0 = time.perf_counter()
    for _ in range(n_chunks):
        stream = pipe.fuse_sequence_rows(layout, params_stats, stream,
                                         stacked, seg_params)
    volume = pipe._exit_rows(layout, pipe._drop_carry(stream))
    float(sum_w(volume))
    dt = time.perf_counter() - t0
    return n_chunks * chunk_frames / dt, volume


def bench_headline():
    import jax.numpy as jnp

    cfg, pipe, params_stats, seg_params, volume, frames = _headline_setup()
    # fold once for the matmul-form inference executor (bf16 configs)
    params_stats = pipe.prepare_params(*params_stats)
    fps, _ = _stream_rows(pipe, params_stats, volume, frames, seg_params)

    fb = pipe.frame_block
    se = int(cfg.SETTINGS.get("sem_integrate_every", 1))
    geo = "bf16" if pipe.geo_dtype == jnp.bfloat16 else "f32"
    return {
        "metric": "joint fusion+semantics throughput, 256x256 depth, "
                  "AdapNet++ stage-2 predict + FusionNet v3 gf6 + 448^3 "
                  "1cm volume, 1 TPU chip (active approximations: "
                  f"frame_block={fb} staleness, sem_integrate_every={se} "
                  f"decimation, {geo} geo accumulators; exact recurrence "
                  "= frame_block 1, sem_every 1, f32 -- measured quality "
                  "cost nil on the joint demo, PERFORMANCE.md)",
        "value": round(fps, 2),
        "unit": "frames/sec",
        "vs_baseline": round(fps / 10.0, 2),
        "approximations": {"frame_block": fb, "sem_integrate_every": se,
                           "geo_dtype": geo},
    }


def bench_speed():
    """Reference speed-model config (configs/fusion/replica_speed.yaml:
    128x128 depth, FusionNet v3 gf6, use_semantics False, 'efficient'
    device-resident volumes -- the README's 37 fps headline): same scene
    scale as the headline bench (448^3 at 1cm), no segmentation net, no
    semantic volume updates.

    Reports TWO numbers in one JSON line: the committed frame_block=8
    configuration as the value, and the exact per-frame recurrence
    (frame_block=1, the reference's own semantics,
    /root/reference/modules/pipeline.py:198-244) as
    exact_recurrence_fps -- the approximation's contribution must stay
    visible in the driver artifact, not just in PERFORMANCE.md."""
    import jax
    import jax.numpy as jnp

    from segfusion_tpu.core.pipeline import Pipeline
    from segfusion_tpu.core.volume import init_scene_volume
    from segfusion_tpu.data.synthetic import SyntheticScene

    h = w = 32 if _TINY else 128
    vshape = (64,) * 3 if _TINY else (448, 448, 448)
    origin = np.array([-2.24, -2.24, -2.24], np.float32)

    def measure(frame_block, frames, n_chunks=2):
        cfg = build_config(h, w)
        cfg.DATA.semantics = None
        cfg.DATA.semantic_strategy = "gt"
        cfg.FUSION_MODEL.use_semantics = False
        cfg.SETTINGS.frame_block = frame_block
        # round-5 measured default (tools/probe_geo_bf16.py): bf16 geo
        # accumulators -- flat at k=8 (71.97 vs 71.57) but +26% at k=4
        # and it halves the carried state; quality cost nil
        # (tools/probe_block_quality.py). SEGFUSION_GEO_DTYPE=float32
        # (retry rung) restores the exact accumulator.
        cfg.SETTINGS.geo_dtype = "bfloat16"
        pipe = Pipeline(cfg)
        params, stats = pipe.init_fusion_params(jax.random.PRNGKey(0),
                                                h, w)
        params, stats = pipe.prepare_params(params, stats)
        volume = init_scene_volume(vshape, origin, 4.48 / vshape[0],
                                   0.1)
        fps, vol_out = _stream_rows(pipe, (params, stats), volume,
                                    frames, None, chunk_frames=64,
                                    n_chunks=n_chunks)
        _free_buffers((vol_out, params, stats))
        return fps

    note("bench: rendering trajectory...")
    scene = SyntheticScene(seed=0, half=2.2)
    frames = render_frames(scene, h, w, 4 if _TINY else 8)
    frames = {k: frames[k] for k in
              ("depth", "extrinsics", "intrinsics", "mask")}
    note("bench: frames ready")

    # measured round-4 default (tools/probe_frame_block.py k-sweep:
    # 30.8 / 33.6 / 51.1 / 71.6 / 78.1 fps at k=1/2/4/8/16): k=8 buys
    # 2.3x by amortising the scatters' fixed full-state pass; k=16's
    # extra 9% is not worth doubling the staleness window. Quality cost
    # on the joint demo checkpoint: none measurable
    # (tools/probe_block_quality.py -- iou/F-score bit-identical).
    # SEGFUSION_FRAME_BLOCK=1 (retry rung) restores the exact recurrence.
    fps = measure(4 if _TINY else 8, frames)

    # the exact-recurrence leg (skipped when an explicit outer
    # SEGFUSION_FRAME_BLOCK makes this an A/B run, when a retry rung
    # already forced k=1, or when the wall-clock budget is nearly spent
    # -- the k=8 line must never be lost to the k=1 compile)
    exact_fps = None
    if os.environ.get("SEGFUSION_FRAME_BLOCK") in (None, "1") \
            and _time_left() > 480:
        import jax

        jax.clear_caches()
        exact_fps = fps if os.environ.get("SEGFUSION_FRAME_BLOCK") == "1" \
            else measure(1, frames, n_chunks=1)

    out = {
        "metric": "depth-fusion throughput (speed model), 128x128 depth, "
                  "FusionNet v3 gf6 no semantics + 448^3 1cm volume, "
                  "1 TPU chip (reference README: 37 fps on GPU; value is "
                  "frame_block=8 staleness approximation + bf16 geo "
                  "accumulators -- exact per-frame recurrence is "
                  "exact_recurrence_fps)",
        "value": round(fps, 2),
        "unit": "frames/sec",
        "vs_baseline": round(fps / 37.0, 2),
    }
    if exact_fps is not None:
        out["exact_recurrence_fps"] = round(exact_fps, 2)
        out["exact_vs_baseline"] = round(exact_fps / 37.0, 2)
    return out


def bench_multi512():
    """BASELINE.json config #5: high-res 512x512 multi-scene streaming."""
    import jax
    import jax.numpy as jnp

    from segfusion_tpu.core.volume import init_scene_volume
    from segfusion_tpu.data.synthetic import SyntheticScene
    from segfusion_tpu.parallel.scene_parallel import (SceneParallelFusion,
                                                       stack_volumes)

    h = w = 32 if _TINY else 512
    n_scenes = 2
    cfg = build_config(h, w)
    # 512^2 batched AdapNet activations x 2 vmapped scenes are the
    # memory-tightest spot on the chip -- cap the pre-pass batch (the
    # retry ladder would drop the pre-pass entirely on OOM)
    if not os.environ.get("SEGFUSION_SEM_PREPASS_BATCH"):
        cfg.SETTINGS.sem_prepass_batch = 4
    pipe, params_stats, seg_params = build_pipeline(cfg, h, w)
    params_stats = pipe.prepare_params(*params_stats)

    # two 3.2m scenes at 1cm share the chip
    vshape = (64,) * 3 if _TINY else (320, 320, 320)
    origin = np.array([-1.6, -1.6, -1.6], np.float32)
    volumes = stack_volumes([
        init_scene_volume(vshape, origin, 3.2 / vshape[0],
                          cfg.DATA.init_value)
        for _ in range(n_scenes)])

    note("bench: rendering trajectories...")
    per_scene = [render_frames(SyntheticScene(seed=s, half=1.5), h, w,
                               2 if _TINY else 8)
                 for s in range(n_scenes)]
    frames = jax.tree_util.tree_map(
        lambda *xs: jnp.stack(xs), *per_scene)     # (S, T, ...)
    reps = 1 if _TINY else 2
    frames = jax.tree_util.tree_map(
        lambda x: jnp.concatenate([x] * reps, axis=1), frames)
    n_frames_total = int(frames["depth"].shape[0]
                         * frames["depth"].shape[1])
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

    return {
        "metric": "multi-scene joint fusion+semantics, 2 scenes x 512x512 "
                  "depth, AdapNet++ stage-2 + FusionNet v3 gf6 + 320^3 1cm "
                  "volumes, aggregate fps, 1 TPU chip (baseline: reference "
                  "10 fps ray-scaled to 512^2 = 2.5)",
        "value": round(fps, 2),
        "unit": "frames/sec",
        "vs_baseline": round(fps / 2.5, 2),
    }


def bench_train():
    """Online-learning throughput: the reference train_fusion.py hot loop
    (reference train_fusion.py:133-189) at the accuracy config -- gt
    extraction + FusionNet v3 forward/backward + integration per frame,
    chunked lax.scan with summed grad accumulation (accumulation_steps=8,
    reference configs/fusion/replica_accuracy.yaml:48), volume donated.
    Semantic strategy 'gt' like the reference training configs (the 2D
    net trains separately)."""
    import jax
    import jax.numpy as jnp

    from segfusion_tpu.core.volume import init_scene_volume
    from segfusion_tpu.data.synthetic import SyntheticScene

    h = w = 32 if _TINY else 256
    cfg = build_config(h, w)
    cfg.DATA.semantic_strategy = "gt"
    pipe, (params, stats), _ = build_pipeline(cfg, h, w)
    pipe.segmenter = None

    scene = SyntheticScene(seed=0, half=2.2)
    vshape = (64,) * 3 if _TINY else (448, 448, 448)
    origin = np.array([-2.24, -2.24, -2.24], np.float32)
    voxel = 4.48 / vshape[0]
    volume = init_scene_volume(vshape, origin, voxel, cfg.DATA.init_value)
    # gt volume for target extraction: the analytic scene sdf sampled at
    # the volume's voxel centers, truncated like the dataset loaders
    ax = (origin[0] + (np.arange(vshape[0], dtype=np.float32) + 0.5)
          * np.float32(voxel))
    x, y, z = np.meshgrid(ax, ax, ax, indexing="ij")
    pts = np.stack([x, y, z], axis=-1)
    gt = jnp.asarray(np.clip(scene.sdf(pts), -0.1, 0.1).astype(np.float32))
    del x, y, z, pts

    note("bench: rendering trajectory...")
    frames = render_frames(scene, h, w, 4 if _TINY else 8)
    # gt semantic labels for the semantic_frame input channel: any static
    # uint8 map exercises the same compute (depth-band quantization)
    sem = jnp.clip(frames["depth"] / 9.0 * 29.0, 0, 29).astype(jnp.uint8)
    frames["semantic_gt"] = sem
    note("bench: frames ready")

    accum = 4 if _TINY else 8
    n_chunks = 1 if _TINY else 3
    n_iters = accum * n_chunks
    rngs = jax.random.split(jax.random.PRNGKey(3), accum)
    resets = jnp.zeros((accum,), bool)

    # row-carried steady state, exactly how train_fusion.py drives it:
    # enter rows + pack the gt shadow ONCE per scene, chain
    # train_sequence_rows across grad-accum chunks (the per-chunk
    # canonical<->slot conversions the old harness paid are NOT the
    # production path)
    from segfusion_tpu.ops import rowvol
    layout = rowvol.RowLayout.for_shape(tuple(volume.num.shape))
    gt_shadow = pipe._gt_shadow(layout, gt)
    stream = pipe._new_stream(layout, pipe._enter_rows(layout, volume))
    float(jnp.sum(stream.rv.geo[0]))
    for buf in (volume.num, volume.weights, volume.semkey):
        buf.delete()
    gt.delete()

    note("bench: compiling train_sequence_rows...")
    loss, grads, stream, stats_w = pipe.train_sequence_rows(
        layout, params, stats, stream, gt_shadow, frames, None, rngs,
        resets)
    float(jnp.sum(stream.rv.geo[0]))
    note("bench: warmup done, timing...")

    t0 = time.perf_counter()
    for _ in range(n_chunks):
        loss, grads, stream, stats_w = pipe.train_sequence_rows(
            layout, params, stats_w, stream, gt_shadow, frames, None,
            rngs, resets)
    float(jnp.sum(stream.rv.geo[0]))
    float(loss)
    dt = time.perf_counter() - t0
    fps = n_iters / dt

    return {
        "metric": "online fusion TRAINING throughput, 256x256 depth, "
                  "FusionNet v3 gf6 fwd+bwd + gt-target extraction + "
                  "448^3 1cm volume integration, grad-accum chunks of 8, "
                  "1 TPU chip (nominal baseline: reference 10 fps online "
                  "joint rate; no published reference training fps)",
        "value": round(fps, 2),
        "unit": "frames/sec",
        "vs_baseline": round(fps / 10.0, 2),
    }


MODES = {
    "headline": bench_headline,
    "speed": bench_speed,
    "multi512": bench_multi512,
    "train": bench_train,
}


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--mode", choices=list(MODES) + ["all"], default="all")
    args = ap.parse_args()
    def run_mode(mode):
        """Retry ladder disabling the default-on perf experiments one at
        a time if a mode fails (e.g. pre-pass activation OOM at 512^2, a
        Mosaic regression in the fused executor) -- a perf experiment
        must never sink the driver artifact."""
        ladder = [{}, {"SEGFUSION_GEO_DTYPE": "float32"},
                  {"SEGFUSION_FRAME_BLOCK": "1"},
                  {"SEGFUSION_SEM_PREPASS": "off"},
                  {"SEGFUSION_FUSED_NET": "off"},
                  {"SEGFUSION_DIRTY_SHADOW": "off"},
                  {"SEGFUSION_GEO_DTYPE": "float32",
                   "SEGFUSION_SEM_EVERY": "1",
                   "SEGFUSION_FRAME_BLOCK": "1",
                   "SEGFUSION_SEM_PREPASS": "off",
                   "SEGFUSION_FUSED_NET": "off",
                   "SEGFUSION_DIRTY_SHADOW": "off"}]
        # skip rungs that contradict an explicit outer env choice
        ladder = [env for env in ladder
                  if all(os.environ.get(k) in (None, v)
                         for k, v in env.items())]
        for i, env in enumerate(ladder):
            saved = {k: os.environ.get(k) for k in env}
            try:
                os.environ.update(env)
                return MODES[mode]()
            except Exception as e:
                if i == len(ladder) - 1:
                    raise
                note(f"bench: mode {mode} failed ({e!r}); "
                     f"retrying with {ladder[i + 1]}")
            finally:
                for k, v in saved.items():
                    if v is None:
                        os.environ.pop(k, None)
                    else:
                        os.environ[k] = v

    if args.mode != "all":
        print(json.dumps(run_mode(args.mode)))
        return
    # All recorded modes, one JSON line each. The HEADLINE runs FIRST
    # (round 4's driver window expired mid-run with headline scheduled
    # last -- the flagship number was never recorded, BENCH_r04.json
    # rc=124) and its line is RE-EMITTED after every secondary mode, so
    # the final stdout line is the headline no matter where a timeout
    # lands. A wall-clock budget (SEGFUSION_BENCH_BUDGET seconds) skips
    # secondaries that would not fit: each remaining mode is estimated
    # at the longest mode seen so far.
    # round-3's driver window fit ~4 modes + 4 failed retries (rc=0), so
    # 40 min of budget is safe; the headline re-emission after every
    # secondary keeps the last-line parse correct even if an external
    # timeout lands first.
    budget = float(os.environ.get("SEGFUSION_BENCH_BUDGET", "2400"))
    t0 = time.monotonic()
    global _DEADLINE, _HEADLINE_LINE
    _DEADLINE = t0 + budget
    _arm_watchdog(budget)
    try:
        _HEADLINE_LINE = json.dumps(run_mode("headline"))
        print(_HEADLINE_LINE, flush=True)
    except Exception as e:
        note(f"bench: headline mode failed: {e!r}")
    durations = [time.monotonic() - t0]
    for mode in ("speed", "train", "multi512"):
        import jax
        # drop the previous mode's executables (and any constants they
        # pin) before the next mode allocates its own 448^3 state -- all
        # modes share one process and donation through the relay is
        # unreliable (see _free_buffers)
        jax.clear_caches()
        left = budget - (time.monotonic() - t0)
        # 1.25x margin: the estimate is the longest mode seen so far, but
        # a fresh mode's compile can exceed it (the watchdog backstops
        # anything that still overruns)
        if left < 1.25 * max(durations):
            note(f"bench: {left:.0f}s left < 1.25x est "
                 f"{max(durations):.0f}s; skipping {mode}")
            continue
        tm = time.monotonic()
        try:
            print(json.dumps(run_mode(mode)), flush=True)
        except Exception as e:   # a secondary mode must not sink the run
            note(f"bench: mode {mode} failed: {e!r}")
        durations.append(time.monotonic() - tm)
        if _HEADLINE_LINE is not None:
            print(_HEADLINE_LINE, flush=True)


if __name__ == "__main__":
    main()
