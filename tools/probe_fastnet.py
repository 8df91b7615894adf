"""FusionNet v3 inference-stage A/B: Flax conv forward vs the folded-BN
matmul executor (models/fusionnet_fast), dots9 vs im2col 3x3 modes.

Composed-loop timing (scan over frames, scalar readback) at the headline
config: 256x256, gf6, semantics on, bf16 compute.

Run ON TPU: python tools/probe_fastnet.py
"""

import time

import jax
import jax.numpy as jnp


def main():
    import bench as B
    from segfusion_tpu.data.synthetic import SyntheticScene
    from segfusion_tpu.models import fusionnet_fast as ff

    h = w = 256
    scene = SyntheticScene(seed=0, half=2.2)
    print("rendering frames...", flush=True)
    frames8 = B.render_frames(scene, h, w, 8)
    frames = jax.tree_util.tree_map(
        lambda x: jnp.concatenate([x] * 4, axis=0), frames8)   # 32

    cfg = B.build_config(h, w)
    pipe, (params, stats), seg_params = B.build_pipeline(cfg, h, w)
    folded = pipe.prepare_params(params, stats)[0]
    folded_pk = ff.fold_v3(params, stats, pack_vortex=True)
    T = 32

    def inputs_of(fr):
        depth = fr["depth"]
        return {
            "tsdf_values": depth[None, ..., None]
            * jnp.ones((1, h, w, pipe.n_points)) * 0.01,
            "tsdf_weights": depth[None, ..., None]
            * jnp.ones((1, h, w, pipe.n_points)),
            "tsdf_frame": depth.reshape(1, h, w, 1),
            "semantic_frame": depth.reshape(1, h, w, 1) * 0.03,
        }

    def flax_loop(frs):
        def body(c, fr):
            est, _ = pipe._network_estimate(params, stats, inputs_of(fr),
                                            train=False, rng=None)
            return c + jnp.sum(est), None
        return jax.lax.scan(body, jnp.float32(0), frs)[0]

    def fused_loop(mode, fd=None):
        fd = folded if fd is None else fd

        def f(frs):
            def body(c, fr):
                est = ff.apply_v3(fd, inputs_of(fr),
                                  dtype=jnp.bfloat16, conv3x3=mode)
                return c + jnp.sum(est), None
            return jax.lax.scan(body, jnp.float32(0), frs)[0]
        return f

    def timeit(name, fn):
        g = jax.jit(fn)
        float(g(frames))
        best = 1e30
        for _ in range(3):
            t0 = time.perf_counter()
            float(g(frames))
            best = min(best, time.perf_counter() - t0)
        print(f"{name}: {best / T * 1e3:7.2f} ms/frame", flush=True)

    timeit("flax conv forward   ", flax_loop)
    timeit("fused dots9         ", fused_loop("dots9"))
    timeit("fused im2col        ", fused_loop("im2col"))
    timeit("fused dots9 packed  ", fused_loop("dots9", folded_pk))
    timeit("fused im2col packed ", fused_loop("im2col", folded_pk))

    # numerics cross-check on one frame (both are bf16 roundings)
    fr = jax.tree_util.tree_map(lambda x: x[0], frames)
    a, _ = pipe._network_estimate(params, stats, inputs_of(fr),
                                  train=False, rng=None)
    b = ff.apply_v3(folded, inputs_of(fr), dtype=jnp.bfloat16)
    print("mean |flax - fused| =", float(jnp.mean(jnp.abs(a - b))),
          flush=True)


if __name__ == "__main__":
    main()
