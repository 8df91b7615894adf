"""Decompose the slot-path stage costs at bench shape (448^3, 256^2
rays): raw gather/scatter floors with the real index streams, full
extract/integrate, and the two Pallas kernels (shadow build, exit
reconcile). Loop-invariant hoisting is defeated with an in-place
one-element dirty instead of a full-state copy.

Run ON TPU: PYTHONPATH=/root/.axon_site:/root/repo python tools/probe_slot_stages.py
"""

import time

import numpy as np
import jax
import jax.numpy as jnp

from segfusion_tpu.ops import rowvol
from segfusion_tpu.ops.pallas.shadow_build import (build_shadow_pallas,
                                                   reconcile_slot_pallas)

SHAPE = (448, 448, 448)
N, P, T = 256 * 256, 9, 7
FRAMES = 8


def ray_points(rng):
    h = w = 256
    yy, xx = np.meshgrid(np.linspace(-1, 1, h), np.linspace(-1, 1, w),
                         indexing="ij")
    d = np.stack([xx * 0.4, yy * 0.4, np.ones_like(xx)], -1)
    d /= np.linalg.norm(d, axis=-1, keepdims=True)
    depth = 180 + 60 * np.sin(3 * xx) * np.cos(2 * yy)
    o = np.array([224.0, 224.0, 30.0]) + rng.rand(h, w, 3) * 0.01
    centers = o + d * depth[..., None]
    j = (np.arange(P) - P / 2) * 0.7
    pts = centers[..., None, :] + d[..., None, :] * j[:, None]
    return jnp.asarray(pts.reshape(N, P, 3).astype(np.float32))


def timed(label, make, *args, reps=3, donate=()):
    fn = jax.jit(make, donate_argnums=donate)
    out = fn(*args)
    s = float(jnp.sum(jax.tree_util.tree_leaves(out)[0][:1]
                      .astype(jnp.float32)))
    best = 1e30
    args = list(args)
    for d in donate:
        args[d] = out[d] if isinstance(out, tuple) else out
    for _ in range(reps):
        t0 = time.perf_counter()
        out = fn(*args)
        float(jnp.sum(jax.tree_util.tree_leaves(out)[0][:1]
                      .astype(jnp.float32)))
        best = min(best, time.perf_counter() - t0)
        if donate:
            for d in donate:
                args[d] = out[d] if isinstance(out, tuple) else out
    print(f"{label:44s} {best / FRAMES * 1e3:8.2f} ms/frame", flush=True)
    return out


def main():
    L = rowvol.RowLayout.for_shape(SHAPE)
    rng = np.random.RandomState(0)
    pts = ray_points(rng)
    iters = jnp.arange(FRAMES, dtype=jnp.float32)
    cr0 = jax.jit(rowvol.corner_rows, static_argnums=1)(pts, L)
    g_idx = jnp.asarray(cr0.k_rows).reshape(-1)             # (2*N*P,)
    sg_idx = jnp.asarray(cr0.sg_rows[:, :, :T]).reshape(-1)  # (2*N*T,)
    sk_idx = jnp.asarray(cr0.k_rows[:, :, :T]).reshape(-1)
    vals = jnp.asarray(rng.randn(N, T).astype(np.float32) * 0.05)
    sem = jnp.asarray(rng.randint(1, 1 << 20, N).astype(np.int32))
    print(f"gathers {g_idx.shape[0]}, scatters {sg_idx.shape[0]}",
          flush=True)

    def dirty(g, i):
        return g.at[i.astype(jnp.int32) % 8, 0].add(1e-12)

    # raw floors
    def mk_gather(shadow, idx):
        def body(c, i):
            g = jnp.take(shadow, (idx + i.astype(jnp.int32))
                         % L.shadow_rows, axis=0)
            return c + jnp.sum(g[:, 0].astype(jnp.float32)), None
        return jax.lax.scan(body, jnp.float32(0), iters)[0][None]

    shadow0 = jnp.zeros((L.shadow_rows, 128), jnp.uint32)
    timed("raw 128-lane slot gather", mk_gather, shadow0, g_idx)

    upd = jnp.ones((sg_idx.shape[0], 128), jnp.float32)

    def mk_scat(geo, idx, u):
        def body(g, i):
            return g.at[idx + i.astype(jnp.int32) % 7].add(u), None
        return jax.lax.scan(body, geo, iters)[0]

    geo0 = jax.jit(lambda: jnp.zeros((L.geo_rows, 128), jnp.float32))()
    geo0 = timed("raw 128-lane slot scatter-add", mk_scat, geo0, sg_idx,
                 upd, donate=(0,))
    del geo0, upd

    kupd = jnp.ones((sk_idx.shape[0], 128), jnp.int32)

    def mk_max(key, idx, u):
        def body(k, i):
            return k.at[idx + i.astype(jnp.int32) % 7].max(u), None
        return jax.lax.scan(body, key, iters)[0]

    key0 = jax.jit(lambda: jnp.zeros((L.key_rows, 128), jnp.int32))()
    key0 = timed("raw 128-lane slot scatter-max", mk_max, key0, sk_idx,
                 kupd, donate=(0,))
    del kupd

    # full extract (corner math + gather + slot select + unpack)
    def mk_extract(shadow, p):
        def body(c, i):
            cr = rowvol.corner_rows(p + i * 0.01, L)
            fv, fw = rowvol.extract_rows(shadow, cr, 0.1, -1.0)
            return c + jnp.sum(fv) * 1e-9, None
        return jax.lax.scan(body, jnp.float32(0), iters)[0][None]

    timed("extract_rows (full)", mk_extract, shadow0, pts)
    del shadow0

    # full integrate
    def mk_int(geo, key, p, v, s):
        def body(carry, i):
            g, k = carry
            cr = rowvol.corner_rows(p + i * 0.01, L)
            return rowvol.integrate_rows(g, k, cr, v, s, None, T), None
        return jax.lax.scan(body, (geo, key), iters)[0]

    geo0 = jax.jit(lambda: jnp.zeros((L.geo_rows, 128), jnp.float32))()
    out = timed("integrate_rows (full, geo+key)", mk_int, geo0, key0,
                pts, vals, sem, donate=(0, 1))
    geo0, key0 = out
    del key0

    # pallas kernels, loop-carried with an in-place dirty
    def mk_shadow(g):
        def body(gc, i):
            gc = dirty(gc, i)
            s = build_shadow_pallas(gc, L)
            return gc, s[0, 0]
        g, _ = jax.lax.scan(body, g, iters)
        return g

    geo0 = timed("build_shadow_pallas", mk_shadow, geo0, donate=(0,))

    def mk_rec(g):
        def body(gc, i):
            gc = dirty(gc, i)
            n, w = reconcile_slot_pallas(gc, L)
            return gc, n[0, 0, 0] + w[0, 0, 0]
        g, _ = jax.lax.scan(body, g, iters)
        return g

    timed("reconcile_slot_pallas", mk_rec, geo0, donate=(0,))


if __name__ == "__main__":
    main()
