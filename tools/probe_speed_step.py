"""Attribute the SPEED mode (128^2, no semantics, dirty carry, fused
net) stage by stage via ablation: the full scan body minus one stage at
a time. Round-4 state: bench speed = 30.91 fps (32.3 ms/frame) vs the
reference's 37 fps (27 ms) -- this probe says where the last 5 ms live.

Run ON TPU: PYTHONPATH=/root/.axon_site:/root/repo python tools/probe_speed_step.py
"""

import time

import numpy as np
import jax
import jax.numpy as jnp


def timed(label, fn, state, xs, frames, reps=3):
    fn_j = jax.jit(fn, donate_argnums=(0,))
    out = fn_j(state, xs)
    float(jnp.sum(out.rv.geo[::65536, ::64]))
    best = 1e30
    for _ in range(reps):
        t0 = time.perf_counter()
        out = fn_j(out, xs)
        float(jnp.sum(out.rv.geo[::65536, ::64]))
        best = min(best, time.perf_counter() - t0)
    print(f"{label:44s} {best / frames * 1e3:8.2f} ms/frame", flush=True)
    return best / frames


def main():
    import bench as B
    from segfusion_tpu.core.volume import init_scene_volume
    from segfusion_tpu.data.synthetic import SyntheticScene
    from segfusion_tpu.ops import geometry, rowvol

    h = w = 128
    cfg = B.build_config(h, w)
    cfg.DATA.semantics = None
    cfg.DATA.semantic_strategy = None
    cfg.FUSION_MODEL.use_semantics = False
    pipe, params_stats, _ = B.build_pipeline(cfg, h, w)
    pipe.semantics = False
    pipe.use_semantics = False
    prepped = pipe.prepare_params(*params_stats)

    vshape = (448, 448, 448)
    origin = np.array([-2.24, -2.24, -2.24], np.float32)

    def fresh_rv():
        # fresh buffers every time: the timed loop DONATES the whole
        # stream pytree (origin/resolution leaves included)
        vol = init_scene_volume(vshape, origin, 0.01, cfg.DATA.init_value)
        return pipe._rows_from_volume(vol)

    layout, rv0 = fresh_rv()
    L = layout
    _, NJ = rowvol.shadow_tiling(L)
    nt = L.X * NJ

    scene = SyntheticScene(seed=0, half=2.2)
    print("rendering frames...", flush=True)
    frames8 = B.render_frames(scene, h, w, 8)
    stacked = jax.tree_util.tree_map(
        lambda x: jnp.concatenate([x] * 4, axis=0), frames8)
    T = 32

    from segfusion_tpu.core.pipeline import RowStream

    def stream0(rv):
        shadow = jnp.zeros((L.shadow_rows, 128), jnp.uint32)
        dirty = jnp.concatenate([jnp.ones((nt,), jnp.int32),
                                 jnp.zeros((1,), jnp.int32)])
        return RowStream(rv, shadow, dirty)

    t = pipe.n_tail_points

    def make_seq(skip):
        def body(stream, fr):
            rv = stream.rv
            depth = fr["depth"]
            points_w = geometry.unproject(depth, fr["extrinsics"],
                                          fr["intrinsics"])
            eye_w = fr["extrinsics"][:3, 3].astype(jnp.float32)
            points_v, _ = geometry.sample_ray_points(
                points_w, eye_w, rv.origin, rv.resolution, pipe.n_points)
            cr = rowvol.corner_rows(points_v, L)
            if skip == "shadow":
                shadow = stream.shadow
                dirty = stream.dirty
            else:
                shadow = rowvol.build_shadow_dirty(
                    rv.geo, stream.shadow, stream.dirty, L, impl="pallas")
                dirty = (jnp.zeros_like(stream.dirty) if skip == "mask"
                         else rowvol.dirty_tile_mask(points_v[:, :t], L))
            if skip == "extract":
                fv = jnp.full((h * w, pipe.n_points), 0.05, jnp.float32)
                fw = jnp.ones((h * w, pipe.n_points), jnp.float32)
            else:
                fv, fw = rowvol.extract_rows(shadow, cr, pipe.init_value,
                                             geometry.INVALID_TSDF_FILL)
            if skip == "net":
                est = fv[None]
            else:
                inputs = {
                    "tsdf_values": fv.reshape(1, h, w, pipe.n_points),
                    "tsdf_weights": fw.reshape(1, h, w, pipe.n_points),
                    "tsdf_frame": depth.reshape(1, h, w, 1),
                }
                est, _ = pipe._network_estimate(
                    prepped[0], prepped[1], inputs, train=False, rng=None)
            upd = jnp.clip(est[0, :, :t], -pipe.init_value,
                           pipe.init_value)
            ray_mask = depth.reshape(-1) != 0.0
            if skip == "integrate":
                geo, key = rv.geo, rv.key
            else:
                geo, key = rowvol.integrate_rows(rv.geo, rv.key, cr, upd,
                                                 None, ray_mask, t)
            return RowStream(rv._replace(geo=geo, key=key), shadow,
                             dirty), None

        def seq(stream, frs):
            stream, _ = jax.lax.scan(body, stream, frs)
            return stream
        return seq

    for skip in ("none", "net", "shadow", "mask", "extract", "integrate"):
        timed(f"speed scan, skip={skip}", make_seq(skip), stream0(rv0),
              stacked, frames=T, reps=2)
        rv0 = fresh_rv()[1]


if __name__ == "__main__":
    main()
