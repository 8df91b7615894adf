"""Step the headline bench stage by stage, printing HBM stats between
stages, to find the allocation that OOMs. Run ON TPU."""

import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)),
                                ".."))


def mem(tag):
    import jax
    s = jax.local_devices()[0].memory_stats() or {}
    used = s.get("bytes_in_use", 0) / 2**30
    peak = s.get("peak_bytes_in_use", 0) / 2**30
    lim = s.get("bytes_limit", 0) / 2**30
    print(f"[mem] {tag:32s} in_use={used:6.2f} GiB peak={peak:6.2f} "
          f"limit={lim:6.2f}", flush=True)


def main():
    import jax
    import jax.numpy as jnp
    import bench as B
    from segfusion_tpu.core.volume import init_scene_volume
    from segfusion_tpu.data.synthetic import SyntheticScene
    from segfusion_tpu.ops import rowvol

    h = w = 256
    cfg = B.build_config(h, w)
    pipe, params_stats, seg_params = B.build_pipeline(cfg, h, w)
    mem("models built")

    scene = SyntheticScene(seed=0, half=2.2)
    vshape = (448, 448, 448)
    origin = np.array([-2.24, -2.24, -2.24], np.float32)
    volume = init_scene_volume(vshape, origin, 0.01, cfg.DATA.init_value)
    mem("volume init")

    frames = B.render_frames(scene, h, w, 8)
    stacked = jax.tree_util.tree_map(
        lambda x: jnp.concatenate([x] * 4, axis=0), frames)
    mem("frames (32) staged")

    layout = rowvol.RowLayout.for_shape(vshape)
    rv = pipe._new_stream(layout, pipe._enter_rows(layout, volume))
    jax.block_until_ready(rv.rv.geo)
    mem("entered rows (volume alive)")

    t0 = time.perf_counter()
    rv = pipe.fuse_sequence_rows(layout, params_stats, rv, stacked,
                                 seg_params)
    jax.block_until_ready(rv.rv.geo)
    mem("chunk 1 (compile+run)")
    print(f"  chunk1 wall: {time.perf_counter()-t0:.1f}s", flush=True)

    t0 = time.perf_counter()
    rv = pipe.fuse_sequence_rows(layout, params_stats, rv, stacked,
                                 seg_params)
    jax.block_until_ready(rv.rv.geo)
    dt = time.perf_counter() - t0
    mem("chunk 2 (warm)")
    print(f"  warm chunk: {dt*1e3:.0f} ms for 32 frames "
          f"-> {32/dt:.2f} fps (pre-exit)", flush=True)

    volume2 = pipe._exit_rows(layout, rv.rv)
    jax.block_until_ready(volume2.num)
    mem("exited rows")
    print("w-sum:", float(jnp.sum(volume2.weights)), flush=True)


if __name__ == "__main__":
    main()
