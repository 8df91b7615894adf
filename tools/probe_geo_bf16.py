"""TPU probe: bf16 geo accumulator state (SETTINGS.geo_dtype) sweep.

The scatter cost model (PERFORMANCE.md) is T ~= state_bytes / ~170 GB/s
+ rows x ~10 ns; the geo slot state at 448^3 is 2.9 GB of f32, so a bf16
accumulator should cut the geo scatter's fixed pass from ~17 ms to
~8.5 ms -- the floor-setter of the exact-recurrence (k=1) speed mode.
This probe measures every bench mode across (geo_dtype x frame_block x
sem_every) in ONE process (axon grant + compile cache paid once).

Run ON TPU: python tools/probe_geo_bf16.py [--mode speed|headline|train|all]
"""

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))


def _set_env(geo, k, sem_every=1):
    os.environ["SEGFUSION_GEO_DTYPE"] = geo
    os.environ["SEGFUSION_FRAME_BLOCK"] = str(k)
    os.environ["SEGFUSION_SEM_EVERY"] = str(sem_every)


def sweep_speed(cases):
    import jax
    import numpy as np
    import bench as B
    from segfusion_tpu.core.pipeline import Pipeline
    from segfusion_tpu.core.volume import init_scene_volume
    from segfusion_tpu.data.synthetic import SyntheticScene

    h = w = 128
    scene = SyntheticScene(seed=0, half=2.2)
    frames = B.render_frames(scene, h, w, 8)
    frames = {k: frames[k] for k in
              ("depth", "extrinsics", "intrinsics", "mask")}
    origin = np.array([-2.24, -2.24, -2.24], np.float32)

    for geo, k in cases:
        _set_env(geo, k)
        cfg = B.build_config(h, w)
        cfg.DATA.semantics = None
        cfg.DATA.semantic_strategy = "gt"
        cfg.FUSION_MODEL.use_semantics = False
        pipe = Pipeline(cfg)
        params, stats = pipe.init_fusion_params(jax.random.PRNGKey(0),
                                                h, w)
        params, stats = pipe.prepare_params(params, stats)
        volume = init_scene_volume((448,) * 3, origin, 4.48 / 448,
                                   cfg.DATA.init_value)
        fps, vol_out = B._stream_rows(pipe, (params, stats), volume,
                                      frames, None, chunk_frames=64,
                                      n_chunks=2)
        print(f"SPEED 128^2  geo={geo:8s} k={k:2d}  {fps:7.2f} fps "
              f"({1000.0 / fps:6.2f} ms/frame)", flush=True)
        B._free_buffers((vol_out, params, stats))
        del pipe, vol_out, params, stats
        jax.clear_caches()


def sweep_headline(cases):
    import jax
    import bench as B

    for geo, k, se in cases:
        _set_env(geo, k, se)
        cfg, pipe, params_stats, seg_params, volume, frames = \
            B._headline_setup()
        params_stats = pipe.prepare_params(*params_stats)
        fps, vol_out = B._stream_rows(pipe, params_stats, volume, frames,
                                      seg_params)
        print(f"HEADLINE 256^2  geo={geo:8s} k={k:2d} sem_every={se}  "
              f"{fps:7.2f} fps ({1000.0 / fps:6.2f} ms/frame)",
              flush=True)
        B._free_buffers((vol_out, params_stats, seg_params))
        del pipe, vol_out, params_stats, seg_params
        jax.clear_caches()


def sweep_train(cases):
    import jax
    import bench as B

    for geo in cases:
        _set_env(geo, 1)
        res = B.bench_train()
        print(f"TRAIN 256^2  geo={geo:8s}  {res['value']:7.2f} fps",
              flush=True)
        jax.clear_caches()


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--mode", default="all",
                    choices=["speed", "headline", "train", "all"])
    args = ap.parse_args()
    t0 = time.time()
    if args.mode in ("speed", "all"):
        sweep_speed([("float32", 1), ("bfloat16", 1), ("bfloat16", 4),
                     ("bfloat16", 8)])
    if args.mode in ("headline", "all"):
        sweep_headline([("float32", 4, 1), ("bfloat16", 4, 1),
                        ("bfloat16", 4, 4), ("bfloat16", 8, 4)])
    if args.mode in ("train", "all"):
        sweep_train(["float32", "bfloat16"])
    print(f"total {time.time() - t0:.0f}s", flush=True)


if __name__ == "__main__":
    main()
