"""Scatter update-build A/B: "minor16" vs "lane128" (rowvol.UPDATE_BUILD).

The trace of the round-2 headline showed two elementwise fusions costing
~37 ms/frame combined (fusion.4723/4724, tools/profile_trace.py) --
consistent with the one-hot update builds going through (M, 8, 16) /
(M, 4, 32) minor-dim intermediates (7/8 / 3/4 of every vreg and store
wasted, CLAUDE.md lane facts) plus a sublane->lane relayout reshape. The
lane128 form is a pure 128-lane select tree. Bit-exact to each other
(tests/test_rowvol.py).

Run ON TPU: python tools/probe_update_build.py
"""

import time

import numpy as np
import jax
import jax.numpy as jnp

import bench as B
from segfusion_tpu.core.volume import init_scene_volume
from segfusion_tpu.data.synthetic import SyntheticScene
from segfusion_tpu.ops import geometry, integrate as integ, rowvol


def main():
    h = w = 256
    n_points, t = 9, 7
    scene = SyntheticScene(seed=0, half=2.2)
    vshape = (448, 448, 448)
    origin = np.array([-2.24, -2.24, -2.24], np.float32)
    volume = init_scene_volume(vshape, origin, 0.01, 0.1)
    L = rowvol.RowLayout.for_shape(vshape)
    print("rendering frames...", flush=True)
    frames = B.render_frames(scene, h, w, 8)
    geo, key = rowvol.rows_from_volume(volume.num, volume.weights,
                                       volume.semkey, L)
    org, res = jnp.asarray(origin), jnp.float32(0.01)

    @jax.jit
    def prep(frames):
        def one(frame):
            pw = geometry.unproject(frame["depth"], frame["extrinsics"],
                                    frame["intrinsics"])
            eye = frame["extrinsics"][:3, 3].astype(jnp.float32)
            pv, _ = geometry.sample_ray_points(pw, eye, org, res, n_points)
            cr = rowvol.corner_rows(pv, L)
            values = jnp.ones((pw.shape[0], t), jnp.float32) * 0.03
            sem_key = integ.pack_semantic_key(
                jnp.full((pw.shape[0],), 0.7, jnp.float32),
                jnp.full((pw.shape[0],), 5, jnp.uint8))
            mask = frame["mask"].reshape(-1)
            return cr, values, sem_key, mask
        return jax.vmap(one)(frames)

    crs, values, sem_keys, masks = prep(frames)
    T = 32
    reps = T // 8
    crs = jax.tree_util.tree_map(
        lambda x: jnp.concatenate([x] * reps, axis=0), crs)
    values = jnp.concatenate([values] * reps, axis=0)
    sem_keys = jnp.concatenate([sem_keys] * reps, axis=0)
    masks = jnp.concatenate([masks] * reps, axis=0)

    import functools
    for mode in ("minor16", "lane128"):
        rowvol.UPDATE_BUILD = mode

        # DONATE the state: without donation the program holds input +
        # output copies of the 4.3 GB (geo, key) state next to ~2 GB of
        # xs and OOMs 16 GB HBM (round-4 session run 1). The state
        # chains through every call, exactly like the production scan.
        @functools.partial(jax.jit, donate_argnums=(0, 1))
        def f(geo, key, crs, values, sem_keys, masks):
            def body(carry, inp):
                g, k = carry
                cr, v, sk, m = inp
                g, k = rowvol.integrate_rows(g, k, cr, v, sk, m, t)
                return (g, k), None
            (g, k), _ = jax.lax.scan(body, (geo, key),
                                     (crs, values, sem_keys, masks))
            return g, k

        geo, key = f(geo, key, crs, values, sem_keys, masks)
        float(jnp.sum(geo[::65536, ::64]) + jnp.sum(key[::65536, ::64]))
        best = 1e30
        for _ in range(3):
            t0 = time.perf_counter()
            geo, key = f(geo, key, crs, values, sem_keys, masks)
            float(jnp.sum(geo[::65536, ::64])
                  + jnp.sum(key[::65536, ::64]))
            best = min(best, time.perf_counter() - t0)
        print(f"{mode:10s}: {best / T * 1e3:7.2f} ms/frame "
              f"(geo+key integrate, {T} frames)", flush=True)


if __name__ == "__main__":
    main()
