"""Dirty-tile shadow rebuild probe: real bench-trajectory dirty
fractions + composed-loop cost of build_shadow vs build_shadow_dirty.

The dirty mask for frame t is frame t-1's integration footprint
(rowvol.dirty_tile_mask of its sampled points); this probe measures the
masks the headline bench trajectory actually produces at 448^3/256^2
and the resulting shadow-stage speedup, composed with extraction as the
consumer (isolated kernel loops overstate throughput ~8x here --
tools/probe_fused_loop.py).

Run ON TPU: python tools/probe_dirty_shadow.py
"""

import time

import numpy as np
import jax
import jax.numpy as jnp


def main(max_ty=None):
    import bench as B
    from segfusion_tpu.core.volume import init_scene_volume
    from segfusion_tpu.data.synthetic import SyntheticScene
    from segfusion_tpu.ops import geometry, rowvol

    if max_ty is not None:
        rowvol.SHADOW_MAX_TY = max_ty
    h = w = 256
    n_points = 9
    scene = SyntheticScene(seed=0, half=2.2)
    vshape = (448, 448, 448)
    origin = np.array([-2.24, -2.24, -2.24], np.float32)
    volume = init_scene_volume(vshape, origin, 0.01, 0.1)
    L = rowvol.RowLayout.for_shape(vshape)
    TY, NJ = rowvol.shadow_tiling(L)
    nt = L.X * NJ
    print(f"layout X={L.X} Y={L.Y} G={L.G} GK={L.GK} TY={TY} NJ={NJ} "
          f"tiles={nt}", flush=True)

    print("rendering frames...", flush=True)
    frames = B.render_frames(scene, h, w, 8)

    geo, _ = rowvol.rows_from_volume(volume.num, volume.weights,
                                     volume.semkey, L)
    org = jnp.asarray(origin)
    res = jnp.float32(0.01)

    @jax.jit
    def frame_cr_mask(frame):
        points_w = geometry.unproject(frame["depth"], frame["extrinsics"],
                                      frame["intrinsics"])
        eye_w = frame["extrinsics"][:3, 3].astype(jnp.float32)
        points_v, _ = geometry.sample_ray_points(points_w, eye_w, org, res,
                                                 n_points)
        cr = rowvol.corner_rows(points_v, L)
        mask = rowvol.dirty_tile_mask(points_v, L)
        return cr, mask

    crs, masks = [], []
    for i in range(8):
        fr = jax.tree_util.tree_map(lambda x: x[i], frames)
        cr, mask = frame_cr_mask(fr)
        crs.append(cr)
        masks.append(mask)
        frac = float(jnp.sum(mask)) / nt
        print(f"frame {i}: dirty fraction {frac:6.3f}", flush=True)
    crs = jax.tree_util.tree_map(lambda *xs: jnp.stack(xs), *crs)
    masks = jnp.stack(masks)                       # (8, nt + 1)
    union = (jnp.sum(masks[:, :nt], axis=0) > 0)
    print(f"union over 8 frames: {float(jnp.sum(union)) / nt:6.3f}",
          flush=True)

    reps = 4
    crs = jax.tree_util.tree_map(
        lambda x: jnp.concatenate([x] * reps, axis=0), crs)
    masks = jnp.concatenate([masks] * reps, axis=0)   # (32, nt + 1)
    T = 32

    def consume(shadow, cr):
        fv, fw = rowvol.extract_rows(shadow, cr, 0.1,
                                     geometry.INVALID_TSDF_FILL)
        return jnp.sum(fv) + jnp.sum(fw)

    @jax.jit
    def loop_full(geo, crs):
        def body(acc, cr):
            shadow = rowvol.build_shadow(geo, L)
            return acc + consume(shadow, cr), None
        return jax.lax.scan(body, jnp.float32(0), crs)[0]

    @jax.jit
    def loop_dirty(geo, shadow0, crs, masks):
        def body(carry, inp):
            acc, shadow = carry
            cr, mask = inp
            shadow = rowvol.build_shadow_dirty(geo, shadow, mask, L)
            return (acc + consume(shadow, cr), shadow), None
        (acc, shadow), _ = jax.lax.scan(body, (jnp.float32(0), shadow0),
                                        (crs, masks))
        return acc + jnp.float32(jnp.sum(shadow[::65536, ::64]))

    def timeit(name, fn, *args):
        out = fn(*args)
        jax.tree_util.tree_map(lambda x: float(jnp.sum(x)), out)
        best = 1e30
        for _ in range(3):
            t0 = time.perf_counter()
            out = fn(*args)
            jax.tree_util.tree_map(lambda x: float(jnp.sum(x)), out)
            best = min(best, time.perf_counter() - t0)
        print(f"{name}: {best / T * 1e3:7.2f} ms/frame", flush=True)
        return best

    print("compiling full loop...", flush=True)
    timeit("full rebuild ", loop_full, geo, crs)
    shadow0 = rowvol.build_shadow(geo, L)
    ones = jnp.concatenate([jnp.ones((nt,), jnp.int32),
                            jnp.zeros((1,), jnp.int32)])
    ones_m = jnp.broadcast_to(ones, (T, nt + 1))
    print("compiling dirty loop...", flush=True)
    timeit("dirty (all-1) ", loop_dirty, geo, shadow0, crs, ones_m)
    timeit("dirty (real)  ", loop_dirty, geo, shadow0, crs, masks)
    zeros_m = jnp.zeros((T, nt + 1), jnp.int32)
    timeit("dirty (all-0) ", loop_dirty, geo, shadow0, crs, zeros_m)


if __name__ == "__main__":
    import sys
    if len(sys.argv) > 1:
        # TY sweep: the dirty rebuild is ~2 DMA issues per dirty tile, so
        # tile height trades issue count against mask granularity (and
        # VMEM: the compute temps scale with TY -- a failed compile at
        # 112+ is itself the answer).
        for ty in [int(a) for a in sys.argv[1:]]:
            print(f"===== SHADOW_MAX_TY = {ty} =====", flush=True)
            try:
                main(ty)
            except Exception as e:
                print(f"TY {ty} failed: {type(e).__name__}: {e}",
                      flush=True)
    else:
        main()
