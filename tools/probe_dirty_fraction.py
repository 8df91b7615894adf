"""Dirty-mask tightness vs image-tile size (rowvol.dirty_tile_mask
tile_px): the dirty shadow rebuild is COMPUTE-bound (~23 ms full volume,
flat in TY -- round-4 sweep), so the real dirty FRACTION multiplies its
cost directly. The mask bounds each image tile's scatter footprint by a
per-tile coordinate bbox; smaller tiles = tighter bboxes = fewer dirty
volume tiles. Prints the real bench-trajectory fractions per tile_px.

Run ON TPU: python tools/probe_dirty_fraction.py
"""

import numpy as np
import jax
import jax.numpy as jnp


def main():
    import bench as B
    from segfusion_tpu.core.volume import init_scene_volume
    from segfusion_tpu.data.synthetic import SyntheticScene
    from segfusion_tpu.ops import geometry, rowvol

    n_points, n_tail = 9, 7
    scene = SyntheticScene(seed=0, half=2.2)
    vshape = (448, 448, 448)
    origin = np.array([-2.24, -2.24, -2.24], np.float32)
    L = rowvol.RowLayout.for_shape(vshape)
    TY, NJ = rowvol.shadow_tiling(L)
    nt = L.X * NJ
    org, res = jnp.asarray(origin), jnp.float32(0.01)
    for h in (256, 128):
        print(f"--- {h}x{h}, TY={TY} ({nt} tiles) ---", flush=True)
        frames = B.render_frames(scene, h, h, 8)

        import functools

        @functools.partial(jax.jit, static_argnums=(1,))
        def masks_for(frames, tile_px):
            def one(frame):
                pw = geometry.unproject(frame["depth"],
                                        frame["extrinsics"],
                                        frame["intrinsics"])
                eye = frame["extrinsics"][:3, 3].astype(jnp.float32)
                pv, _ = geometry.sample_ray_points(pw, eye, org, res,
                                                   n_points)
                return rowvol.dirty_tile_mask(pv[:, :n_tail], L,
                                              tile_px=tile_px)
            return jax.vmap(one)(frames)

        for tile_px in (8, 4, 2, 1):
            m = masks_for(frames, tile_px)
            fr = np.asarray(jnp.sum(m[:, :nt], axis=1)) / nt
            print(f"tile_px={tile_px}: mean {fr.mean():.3f} "
                  f"per-frame {np.round(fr, 3).tolist()}", flush=True)


if __name__ == "__main__":
    main()
