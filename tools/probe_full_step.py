"""Attribute the full bench step (bench.py headline config) stage by
stage: row vs flat fuse_sequence, the two CNNs alone, the row hot path
without nets, and the rows<->canonical conversion costs.

Run ON TPU: PYTHONPATH=/root/.axon_site:/root/repo python tools/probe_full_step.py
"""

import time

import numpy as np
import jax
import jax.numpy as jnp


def sync(x):
    return float(jnp.sum(jax.tree_util.tree_leaves(x)[0].astype(jnp.float32)))


def timed(label, fn, *args, frames=1, reps=3, donate=None):
    try:
        fn_j = jax.jit(fn, donate_argnums=donate) if donate else jax.jit(fn)
        args = list(args)
        out = fn_j(*args)
        sync(out)
        if donate:
            args[donate[0]] = out
        best = 1e30
        for _ in range(reps):
            t0 = time.perf_counter()
            out = fn_j(*args)
            sync(out)
            best = min(best, time.perf_counter() - t0)
            if donate:
                args[donate[0]] = out
        print(f"{label:52s} {best / frames * 1e3:8.2f} ms/frame",
              flush=True)
        return best / frames
    except Exception as e:  # one OOM must not sink the whole session
        print(f"{label:52s} FAILED: {e!r}"[:300], flush=True)
        return float("nan")


def main():
    import bench as B
    from segfusion_tpu.core.volume import init_scene_volume
    from segfusion_tpu.data.synthetic import SyntheticScene
    from segfusion_tpu.ops import rowvol, geometry

    h = w = 256
    cfg = B.build_config(h, w)
    pipe, params_stats, seg_params = B.build_pipeline(cfg, h, w)

    vshape = (448, 448, 448)
    origin = np.array([-2.24, -2.24, -2.24], np.float32)
    volume = init_scene_volume(vshape, origin, 0.01, cfg.DATA.init_value)

    scene = SyntheticScene(seed=0, half=2.2)
    print("rendering frames...", flush=True)
    frames8 = B.render_frames(scene, h, w, 8)
    stacked = jax.tree_util.tree_map(
        lambda x: jnp.concatenate([x] * 4, axis=0), frames8)   # 32 frames

    # 1. full row-path sequence (the bench measurement)
    pipe.row_path = True
    timed("fuse_sequence row path (32 frames)",
          lambda v: pipe.fuse_sequence_impl(params_stats, v, stacked,
                                            seg_params),
          volume, frames=32, reps=2)

    # 1b. same with the folded matmul net executor (the bench default on
    # bf16 configs -- what `python bench.py` actually runs)
    prepped = pipe.prepare_params(*params_stats)
    timed("fuse_sequence row path + fused net (32 frames)",
          lambda v: pipe.fuse_sequence_impl(prepped, v, stacked,
                                            seg_params),
          volume, frames=32, reps=2)

    # 1c. the in-context semantic pre-pass decision: same as 1b with the
    # batched pre-pass disabled (per-frame AdapNet inside the scan)
    pipe.sem_prepass = False
    timed("fuse_sequence row path + fused net, no pre-pass",
          lambda v: pipe.fuse_sequence_impl(prepped, v, stacked,
                                            seg_params),
          volume, frames=32, reps=2)
    pipe.sem_prepass = True

    # 2. full flat-path sequence
    pipe.row_path = False
    timed("fuse_sequence flat path (32 frames)",
          lambda v: pipe.fuse_sequence_impl(params_stats, v, stacked,
                                            seg_params),
          volume, frames=32, reps=2)
    pipe.row_path = True

    # 3. the two CNNs alone, scanned over frames
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

    timed("AdapNet predict + FusionNet (32 frames)", nets_only, stacked,
          frames=32, reps=2)

    # 4. row hot path without nets (extract + integrate + shadow build)
    layout, rv0 = pipe._rows_from_volume(volume)
    jax.block_until_ready(rv0.geo)

    def row_no_net(rv, frs):
        def body(rv, fr):
            depth = fr["depth"]
            points_w = geometry.unproject(depth, fr["extrinsics"],
                                          fr["intrinsics"])
            eye_w = fr["extrinsics"][:3, 3].astype(jnp.float32)
            points_v, _ = geometry.sample_ray_points(
                points_w, eye_w, rv.origin, rv.resolution, pipe.n_points)
            cr = rowvol.corner_rows(points_v, layout)
            shadow = rowvol.build_shadow(rv.geo, layout)
            fv, fw = rowvol.extract_rows(shadow, cr, pipe.init_value,
                                         geometry.INVALID_TSDF_FILL)
            t = pipe.n_tail_points
            upd = jnp.clip(fv[:, :t] * 0.5, -0.1, 0.1)
            ray_mask = depth.reshape(-1) > 0
            sem_key = jnp.full((h * w,), 123456, jnp.int32)
            geo, key = rowvol.integrate_rows(rv.geo, rv.key, cr, upd,
                                             sem_key, ray_mask, t)
            return rv._replace(geo=geo, key=key), None
        rv, _ = jax.lax.scan(body, rv, frs)
        return rv

    timed("row hot path no nets (32 frames)", row_no_net, rv0, stacked,
          frames=32, reps=2)

    # 4b. same but without the semantic scatter-max
    def row_no_net_nosem(rv, frs):
        def body(rv, fr):
            depth = fr["depth"]
            points_w = geometry.unproject(depth, fr["extrinsics"],
                                          fr["intrinsics"])
            eye_w = fr["extrinsics"][:3, 3].astype(jnp.float32)
            points_v, _ = geometry.sample_ray_points(
                points_w, eye_w, rv.origin, rv.resolution, pipe.n_points)
            cr = rowvol.corner_rows(points_v, layout)
            shadow = rowvol.build_shadow(rv.geo, layout)
            fv, fw = rowvol.extract_rows(shadow, cr, pipe.init_value,
                                         geometry.INVALID_TSDF_FILL)
            t = pipe.n_tail_points
            upd = jnp.clip(fv[:, :t] * 0.5, -0.1, 0.1)
            ray_mask = depth.reshape(-1) > 0
            geo, key = rowvol.integrate_rows(rv.geo, rv.key, cr, upd,
                                             None, ray_mask, t)
            return rv._replace(geo=geo, key=key), None
        rv, _ = jax.lax.scan(body, rv, frs)
        return rv

    timed("row hot path no nets, no sem scatter", row_no_net_nosem, rv0,
          stacked, frames=32, reps=2)

    # 5. conversions
    timed("rows_from_volume (one-shot)",
          lambda v: pipe._rows_from_volume(v)[1].geo, volume, reps=2)
    timed("volume_from_rows (one-shot)",
          lambda g, k: rowvol.volume_from_rows(g, k, layout)[0],
          rv0.geo, rv0.key, reps=2)


if __name__ == "__main__":
    main()
