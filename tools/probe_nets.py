"""Net-stage probe: AdapNet predict + FusionNet v3 forward cost, stacked
vs unstacked heads (models/fusionnet.py FusionNetV3.stack_heads).

Run ON TPU: PYTHONPATH=$PYTHONPATH:/root/repo python tools/probe_nets.py
"""

import time

import numpy as np
import jax
import jax.numpy as jnp


def main():
    import bench as B
    from segfusion_tpu.data.synthetic import SyntheticScene

    h = w = 256
    scene = SyntheticScene(seed=0, half=2.2)
    print("rendering frames...", flush=True)
    frames8 = B.render_frames(scene, h, w, 8)
    stacked_frames = jax.tree_util.tree_map(
        lambda x: jnp.concatenate([x] * 4, axis=0), frames8)   # 32 frames

    for stack in (False, True):
        cfg = B.build_config(h, w)
        cfg.FUSION_MODEL.stack_heads = stack
        pipe, params_stats, seg_params = B.build_pipeline(cfg, h, w)
        params, batch_stats = params_stats

        def nets_only(frs):
            def body(c, fr):
                sem_ids, scores = pipe._predict_semantics(
                    seg_params, fr["image"], fr["depth_input"])
                depth = fr["depth"]
                inputs = {
                    "tsdf_values": jnp.zeros((1, h, w, pipe.n_points)),
                    "tsdf_weights": jnp.zeros((1, h, w, pipe.n_points)),
                    "tsdf_frame": depth.reshape(1, h, w, 1),
                    "semantic_frame": (1.0 + sem_ids.reshape(depth.shape)
                                       .astype(jnp.float32))[None, ..., None]
                    / pipe.n_classes,
                }
                est, _ = pipe._network_estimate(params, batch_stats, inputs,
                                                train=False, rng=None)
                return c + jnp.sum(est) + jnp.sum(scores), None
            return jax.lax.scan(body, jnp.float32(0), frs)[0]

        fn = jax.jit(nets_only)
        out = fn(stacked_frames)
        float(out)
        best = 1e30
        for _ in range(3):
            t0 = time.perf_counter()
            float(fn(stacked_frames))
            best = min(best, time.perf_counter() - t0)
        print(f"stack_heads={stack}: {best / 32 * 1e3:7.2f} ms/frame",
              flush=True)

    # Per-net attribution (unstacked config): which of the two nets owns
    # the stage -- gates whether a fused Pallas FusionNet executor (the
    # small-channel conv stack pays a per-op floor in XLA) is worth it.
    cfg = B.build_config(h, w)
    pipe, params_stats, seg_params = B.build_pipeline(cfg, h, w)
    params, batch_stats = params_stats

    def adapnet_only(frs):
        def body(c, fr):
            sem_ids, scores = pipe._predict_semantics(
                seg_params, fr["image"], fr["depth_input"])
            return c + jnp.sum(scores) + jnp.sum(sem_ids), None
        return jax.lax.scan(body, jnp.float32(0), frs)[0]

    def fusionnet_only(frs):
        def body(c, fr):
            depth = fr["depth"]
            inputs = {
                "tsdf_values": depth[None, ..., None]
                * jnp.ones((1, h, w, pipe.n_points)) * 0.01,
                "tsdf_weights": depth[None, ..., None]
                * jnp.ones((1, h, w, pipe.n_points)),
                "tsdf_frame": depth.reshape(1, h, w, 1),
                "semantic_frame": depth.reshape(1, h, w, 1) * 0.03,
            }
            est, _ = pipe._network_estimate(params, batch_stats, inputs,
                                            train=False, rng=None)
            return c + jnp.sum(est), None
        return jax.lax.scan(body, jnp.float32(0), frs)[0]

    def adapnet_prepass(frs):
        ids, scores = pipe._predict_semantics_batched(
            seg_params, frs["image"], frs["depth_input"])
        return jnp.sum(scores) + jnp.sum(ids)

    for name, f in (("adapnet only", adapnet_only),
                    ("fusionnet only", fusionnet_only),
                    (f"adapnet pre-pass b{pipe.sem_prepass_batch}",
                     adapnet_prepass)):
        fn = jax.jit(f)
        float(fn(stacked_frames))
        best = 1e30
        for _ in range(3):
            t0 = time.perf_counter()
            float(fn(stacked_frames))
            best = min(best, time.perf_counter() - t0)
        print(f"{name}: {best / 32 * 1e3:7.2f} ms/frame", flush=True)


if __name__ == "__main__":
    main()
