"""TPU probe: frame-block integration k-sweep (SETTINGS.frame_block).

Measures the speed mode (128^2, no semantics) and the headline mode
(256^2, joint) of bench.py at frame_block k in {1, 2, 4, 8, 16} /
{1, 2, 4}, all in ONE process (the axon grant + compile cache are paid
once). The lever amortises the scatters' fixed full-state pass and the
shadow rebuild by k (PERFORMANCE.md "scatter cost model"); the sweep
picks the committed bench defaults.

Run ON TPU: python tools/probe_frame_block.py [--mode speed|headline|both]
"""

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))


def sweep_speed(ks):
    import jax
    import jax.numpy as jnp
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

    for k in ks:
        os.environ["SEGFUSION_FRAME_BLOCK"] = str(k)
        cfg = B.build_config(h, w)
        cfg.DATA.semantics = None
        cfg.DATA.semantic_strategy = "gt"
        cfg.FUSION_MODEL.use_semantics = False
        pipe = Pipeline(cfg)
        params, stats = pipe.init_fusion_params(jax.random.PRNGKey(0), h, w)
        params, stats = pipe.prepare_params(params, stats)
        volume = init_scene_volume((448,) * 3, origin, 4.48 / 448,
                                   cfg.DATA.init_value)
        fps, vol_out = B._stream_rows(pipe, (params, stats), volume,
                                      frames, None, chunk_frames=64,
                                      n_chunks=2)
        print(f"SPEED 128^2  k={k:2d}  {fps:7.2f} fps "
              f"({1000.0 / fps:6.2f} ms/frame)", flush=True)
        # drop the whole iteration's device state + executables before
        # the next k compiles its own programs (the relay chip has no
        # donation slack; dead constants in cached executables add up)
        B._free_buffers((vol_out, params, stats))
        del pipe, vol_out, params, stats
        jax.clear_caches()


def sweep_headline(ks, sems=(None,), earlys=(None,)):
    import jax
    import numpy as np
    import bench as B
    from segfusion_tpu.core.volume import init_scene_volume

    from segfusion_tpu.ops import rowvol

    for sem in sems:
        if sem is not None:
            os.environ["SEGFUSION_SEM_EVERY"] = str(sem)
        for k in ks:
            for early in earlys:
                etag = ""
                if early is not None:
                    rowvol.EARLY_CAST = bool(early)
                    etag = f" early_cast={int(early)}"
                os.environ["SEGFUSION_FRAME_BLOCK"] = str(k)
                cfg, pipe, params_stats, seg_params, volume, frames = \
                    B._headline_setup()
                params_stats = pipe.prepare_params(*params_stats)
                fps, vol_out = B._stream_rows(pipe, params_stats, volume,
                                              frames, seg_params)
                tag = "" if sem is None else f" sem_every={sem}"
                print(f"HEADLINE 256^2  k={k:2d}{tag}{etag}  {fps:7.2f} "
                      f"fps ({1000.0 / fps:6.2f} ms/frame)", flush=True)
                B._free_buffers((vol_out, params_stats, seg_params))
                del pipe, vol_out, params_stats, seg_params
                jax.clear_caches()


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--mode", default="both",
                    choices=["speed", "headline", "both"])
    ap.add_argument("--ks", default=None,
                    help="comma-separated k values")
    ap.add_argument("--sems", default=None,
                    help="comma-separated sem_integrate_every values for "
                         "the headline sweep (cross product with --ks); "
                         "default: inherit SEGFUSION_SEM_EVERY")
    ap.add_argument("--earlys", default=None,
                    help="comma-separated 0/1 rowvol.EARLY_CAST values "
                         "(headline sweep cross product)")
    args = ap.parse_args()
    if args.mode in ("speed", "both"):
        ks = ([int(x) for x in args.ks.split(",")] if args.ks
              else [1, 2, 4, 8, 16])
        sweep_speed(ks)
    if args.mode in ("headline", "both"):
        ks = ([int(x) for x in args.ks.split(",")] if args.ks
              else [1, 2, 4])
        sems = ([int(x) for x in args.sems.split(",")] if args.sems
                else [None])
        earlys = ([int(x) for x in args.earlys.split(",")]
                  if args.earlys else [None])
        sweep_headline(ks, sems, earlys)


if __name__ == "__main__":
    main()
