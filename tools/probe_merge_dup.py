"""MERGE_DUP A/B: in-context cost of the integrate stage with and
without in-ray duplicate-row pre-merging (rowvol.MERGE_DUP).

Along a ray, consecutive tail samples usually land in the SAME geo slot
row (z-groups span 16 voxels, y_lo rarely steps between neighbouring
samples). The merge pre-combines those runs with t-1 fused (b, 128)
where+op steps and re-targets leftovers at the zero pad row, so it pays
only if XLA TPU scatter cost follows distinct-row structure rather than
update-row count (tools/probe_scatter_dup.py measures that question on
synthetic rows; THIS probe is the honest in-context decision, real ray
geometry + the full integrate_rows).

Also prints the measured duplicate fraction of a real frame's update
stream -- the merge's payoff ceiling.

Run ON TPU: python tools/probe_merge_dup.py
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

    # duplicate fraction of frame 0's geo update stream (payoff ceiling)
    rows0 = np.asarray(
        jax.tree_util.tree_map(lambda x: x[0], crs).sg_rows[:, :, :t]
    ).reshape(-1, t)
    dup = (rows0[:, 1:] == rows0[:, :-1]).mean()
    print(f"in-tail duplicate-row fraction (real frame): {dup:.3f}")

    T = 32
    reps = T // 8
    crs = jax.tree_util.tree_map(
        lambda x: jnp.concatenate([x] * reps, axis=0), crs)
    values = jnp.concatenate([values] * reps, axis=0)
    sem_keys = jnp.concatenate([sem_keys] * reps, axis=0)
    masks = jnp.concatenate([masks] * reps, axis=0)

    import functools
    for merge in (False, True):
        rowvol.MERGE_DUP = merge

        # donated state chain -- see probe_update_build (un-donated, the
        # in+out state copies OOM 16 GB HBM next to the xs)
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
        print(f"MERGE_DUP={merge!s:5s}: {best / T * 1e3:7.2f} ms/frame "
              f"(geo+key integrate, {T} frames)", flush=True)


if __name__ == "__main__":
    main()
