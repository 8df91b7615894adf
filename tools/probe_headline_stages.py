"""Attribute the HEADLINE mode (256^2, joint semantics, committed
round-5 defaults: frame_block=4, sem_integrate_every=8, bf16 geo) stage
by stage via ablation: the REAL production path (bench._headline_setup
-> Pipeline.fuse_sequence_rows) with one stage monkeypatched out at a
time, a fresh Pipeline per ablation (the jit cache keys on the static
``self``, so each variant traces fresh against the patched functions).

The round-4 table in PERFORMANCE.md attributed ~80 ms of the then
12.46 fps frame; at the round-5 defaults (55 ms/frame) the amortised
scatters no longer dominate and this probe says what does.

Ablations (each removes ONE stage, keeping upstream live):
  none        full committed-defaults body (baseline)
  adapnet     constant (ids, scores) instead of the batched AdapNet
              pre-pass
  fusionnet   identity net (est = extracted tsdf values)
  extract     constant (fv, fw): gather + select128 + trilinear removed
  gather_only extraction's row gather kept live, select/unpack removed
              (isolates gather issue cost vs select compute)
  shadow      dirty shadow rebuild skipped (stale shadow reused)
  mask        dirty_tile_mask zeroed (isolates the mask einsum; also
              turns the rebuild into a 0-tile pass)
  integrate   scatters AND update build removed (cheap live fold)
  scatter_op  (M, 128) update build kept, scatter ops removed

Run ON TPU:  python tools/probe_headline_stages.py
"""

import contextlib
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))


def main():
    import jax
    import jax.numpy as jnp

    import bench as B
    from segfusion_tpu.core.volume import init_scene_volume
    from segfusion_tpu.ops import rowvol

    # one setup for the frames/scene; fresh pipeline + volume per ablation
    cfg, pipe0, _, seg_params, volume0, frames = B._headline_setup()
    h = w = 32 if B._TINY else 256
    n_points = pipe0.n_points
    for buf in (volume0.num, volume0.weights, volume0.semkey):
        buf.delete()
    vshape = (64,) * 3 if B._TINY else (448, 448, 448)
    origin = np.array([-2.24, -2.24, -2.24], np.float32)

    chunk_frames, n_chunks = (4, 1) if B._TINY else (32, 2)
    reps = chunk_frames // next(iter(frames.values())).shape[0]
    stacked = jax.tree_util.tree_map(
        lambda x: jnp.concatenate([x] * reps, axis=0), frames)

    orig = {
        "extract_rows": rowvol.extract_rows,
        "build_shadow_dirty": rowvol.build_shadow_dirty,
        "dirty_tile_mask": rowvol.dirty_tile_mask,
        "integrate_rows": rowvol.integrate_rows,
        "_geo_scatter": rowvol._geo_scatter,
        "_key_scatter": rowvol._key_scatter,
    }

    def live_fold(state, s):
        # cheap live dependency on ``s`` without a scatter op: read-modify-
        # write ONE row via dynamic_update_slice (aliases the donated
        # carry; no full-state pass)
        row = (state[0:1].astype(jnp.float32)
               + s.astype(jnp.float32)).astype(state.dtype)
        return jax.lax.dynamic_update_slice(state, row, (0, 0))

    @contextlib.contextmanager
    def patched(name):
        try:
            if name == "extract":
                def fake_extract(shadow, cr, init_value, fill_value,
                                 chunk=None):
                    shp = cr.ksl.shape
                    return (jnp.full(shp, 0.05, jnp.float32),
                            jnp.ones(shp, jnp.float32))
                rowvol.extract_rows = fake_extract
            elif name == "gather_only":
                def gather_extract(shadow, cr, init_value, fill_value,
                                   chunk=None):
                    n, p = cr.ksl.shape
                    m = n * p
                    rows = jnp.take(shadow, cr.k_rows.reshape(-1), axis=0)
                    s = jnp.sum(rows.astype(jnp.float32), axis=1)
                    fv = (s[:m] + s[m:]).reshape(n, p) * 1e-30 + 0.05
                    return fv, jnp.ones((n, p), jnp.float32)
                rowvol.extract_rows = gather_extract
            elif name == "shadow":
                rowvol.build_shadow_dirty = \
                    lambda geo, prev, dirty, layout, impl=None: prev
            elif name == "mask":
                real = orig["dirty_tile_mask"]

                def zero_mask(points_v, layout, tile_px=None):
                    ty, nj = rowvol.shadow_tiling(layout)
                    del ty
                    return jnp.zeros((layout.X * nj + 1,), jnp.int32)
                rowvol.dirty_tile_mask = zero_mask
                del real
            elif name == "integrate":
                def fold_integrate(geo, key, cr, values, sem_key, ray_mask,
                                   n_tail, chunk=None, do_sem=None):
                    geo = live_fold(geo, jnp.sum(values))
                    if sem_key is not None:
                        key = live_fold(key, jnp.sum(sem_key))
                    return geo, key
                rowvol.integrate_rows = fold_integrate
            elif name == "scatter_op":
                def fold_geo(geo, b, t_merge=0):
                    upd = rowvol._build_geo_update(b.sgs, b.vals8)
                    return live_fold(geo, jnp.sum(upd))

                def fold_key(key, b, t_merge=0):
                    upd = rowvol._build_key_update(b.ksl, b.kvals)
                    return live_fold(key, jnp.max(upd))
                rowvol._geo_scatter = fold_geo
                rowvol._key_scatter = fold_key
            yield
        finally:
            for k, v in orig.items():
                setattr(rowvol, k, v)

    def run(name):
        with patched(name):
            pipe, params_stats, sp = B.build_pipeline(cfg, h, w)
            params_stats = pipe.prepare_params(*params_stats)
            if name == "adapnet":
                T = next(iter(stacked.values())).shape[0]
                ids0 = jnp.zeros((T, h * w), jnp.uint8)
                sc0 = jnp.ones((T, h * w), jnp.float32)

                def const_prepass(frs, seg_p, need_sem):
                    out = dict(frs)
                    out["sem_ids_pre"] = ids0
                    out["sem_scores_pre"] = sc0
                    return out
                pipe._sem_prepass_frames = const_prepass
            elif name == "fusionnet":
                pipe._network_estimate_batch = \
                    lambda params, bs, inputs: inputs["tsdf_values"].reshape(
                        inputs["tsdf_values"].shape[0], -1, n_points)

            volume = init_scene_volume(vshape, origin, 4.48 / vshape[0],
                                       cfg.DATA.init_value)
            layout = rowvol.RowLayout.for_shape(tuple(volume.num.shape))
            stream = pipe._new_stream(layout,
                                      pipe._enter_rows(layout, volume))
            float(jnp.sum(stream.rv.geo[0]))
            for buf in (volume.num, volume.weights, volume.semkey):
                buf.delete()
            # compile + settle the dirty carry into steady state
            stream = pipe.fuse_sequence_rows(layout, params_stats, stream,
                                             stacked, sp)
            float(jnp.sum(stream.rv.geo[0].astype(jnp.float32)))
            best = 1e30
            for _ in range(2):
                t0 = time.perf_counter()
                for _ in range(n_chunks):
                    stream = pipe.fuse_sequence_rows(
                        layout, params_stats, stream, stacked, sp)
                float(jnp.sum(stream.rv.geo[0].astype(jnp.float32)))
                best = min(best, time.perf_counter() - t0)
            ms = best / (n_chunks * chunk_frames) * 1e3
            print(f"headline ablation {name:12s} {ms:8.2f} ms/frame "
                  f"({1e3 / ms:6.2f} fps)", flush=True)
            B._free_buffers(stream)
            B._free_buffers(params_stats)
            return ms

    base = run("none")
    for name in ("adapnet", "fusionnet", "extract", "gather_only",
                 "shadow", "mask", "integrate", "scatter_op"):
        ms = run(name)
        print(f"  -> stage cost vs baseline: {base - ms:+8.2f} ms/frame",
              flush=True)


if __name__ == "__main__":
    main()
