"""Decompose the row-path stage costs at bench shape with RAY-LIKE
(clustered) corner indices: raw gather/scatter with the exact index
streams the pipeline produces vs the full stages (gather + one-hot
lane-select + unpack), plus build_shadow split into reconcile and
restride/pack parts.

Run ON TPU: PYTHONPATH=/root/repo python tools/probe_row_stages2.py
"""

import time

import numpy as np
import jax
import jax.numpy as jnp

from segfusion_tpu.ops import rowvol

SHAPE = (448, 448, 448)
N, P, T = 256 * 256, 9, 7
FRAMES = 8


def sync(x):
    leaf = jax.tree_util.tree_leaves(x)[0]
    return float(jnp.sum(leaf.astype(jnp.float32)))


def timed(label, fn, *args, per=1, reps=3):
    fn_j = jax.jit(fn)
    sync(fn_j(*args))
    best = 1e30
    for _ in range(reps):
        t0 = time.perf_counter()
        sync(fn_j(*args))
        best = min(best, time.perf_counter() - t0)
    ms = best / FRAMES * 1e3
    extra = f"  ({best / FRAMES / per * 1e9:.1f} ns/row)" if per > 1 else ""
    print(f"{label:44s} {ms:8.2f} ms/frame{extra}", flush=True)
    return ms


def ray_points(rng):
    """Ray-like sample points: smooth pixel grid of origins/directions,
    consecutive samples ~0.7 voxel apart (the real extraction geometry)."""
    h = w = 256
    yy, xx = np.meshgrid(np.linspace(-1, 1, h), np.linspace(-1, 1, w),
                         indexing="ij")
    d = np.stack([xx * 0.4, yy * 0.4, np.ones_like(xx)], -1)
    d /= np.linalg.norm(d, axis=-1, keepdims=True)
    depth = 180 + 60 * np.sin(3 * xx) * np.cos(2 * yy)   # smooth surface
    o = np.array([224.0, 224.0, 30.0]) + rng.rand(h, w, 3) * 0.01
    centers = o + d * depth[..., None]
    j = (np.arange(P) - P / 2) * 0.7
    pts = centers[..., None, :] + d[..., None, :] * j[:, None]
    return jnp.asarray(pts.reshape(N, P, 3).astype(np.float32))


def main():
    L = rowvol.RowLayout.for_shape(SHAPE)
    rng = np.random.RandomState(0)
    pts = ray_points(rng)
    geo = jnp.zeros((L.rows, 512), jnp.float32)
    key = jnp.zeros((L.key_rows, 128), jnp.int32)
    shadow = jax.jit(rowvol.build_shadow, static_argnums=1)(geo, L)
    vals = jnp.asarray(rng.randn(N, T).astype(np.float32) * 0.05)
    sem = jnp.asarray(rng.randint(1, 1 << 20, N).astype(np.int32))
    cr0 = jax.jit(rowvol.corner_rows, static_argnums=1)(pts, L)
    g_idx = jnp.asarray(cr0.g_rows).reshape(-1)          # (N*P*2,)
    s_idx = jnp.asarray(cr0.s_rows[:, :T]).reshape(-1)   # (N*T*2,)
    ones_g = jnp.ones((s_idx.shape[0], 512), jnp.float32)
    ones_k = jnp.ones((s_idx.shape[0], 256), jnp.int32)
    iters = jnp.arange(FRAMES, dtype=jnp.float32)

    print(f"g_rows: {g_idx.shape[0]} rows/frame, s_rows: "
          f"{s_idx.shape[0]} rows/frame", flush=True)

    # raw row-gather with the REAL index stream
    def raw_gather(c, i, sh, idx):
        g = jnp.take(sh, (idx + i.astype(jnp.int32)) % L.shadow_rows,
                     axis=0)
        return c + jnp.sum(g[:, 0].astype(jnp.float32))

    timed("raw 256-lane gather (real ray indices)",
          lambda sh, idx: jax.lax.scan(
              lambda c, i: (raw_gather(c, i, sh, idx), None),
              jnp.float32(0), iters)[0],
          shadow, g_idx, per=g_idx.shape[0])

    # raw scatter-add with the REAL index stream
    def raw_scatter(sh, idx, upd):
        def body(c, i):
            return c.at[(idx + i.astype(jnp.int32)) % L.rows].add(upd), None
        return jax.lax.scan(body, sh, iters)[0]

    timed("raw 512-lane scatter-add (real indices)",
          raw_scatter, geo, s_idx, ones_g, per=s_idx.shape[0])

    def raw_scatter_max(sh, idx, upd):
        def body(c, i):
            return c.at[(idx + i.astype(jnp.int32)) % L.rows].max(upd), None
        return jax.lax.scan(body, sh, iters)[0]

    timed("raw 256-lane scatter-max (real indices)",
          raw_scatter_max, key, s_idx, ones_k, per=s_idx.shape[0])

    # full extraction (corner math + gather + one-hot select + unpack)
    def ex_body(c, i, sh, p):
        cr = rowvol.corner_rows(p + i * 0.01, L)
        fv, fw = rowvol.extract_rows(sh, cr, 0.1, -1.0)
        return c + jnp.sum(fv) * 1e-9

    timed("extract_rows chunk=8192",
          lambda sh, p: jax.lax.scan(
              lambda c, i: (ex_body(c, i, sh, p), None),
              jnp.float32(0), iters)[0], shadow, pts)

    def ex_body_big(c, i, sh, p):
        cr = rowvol.corner_rows(p + i * 0.01, L)
        fv, fw = rowvol.extract_rows(sh, cr, 0.1, -1.0, chunk=65536)
        return c + jnp.sum(fv) * 1e-9

    timed("extract_rows unchunked",
          lambda sh, p: jax.lax.scan(
              lambda c, i: (ex_body_big(c, i, sh, p), None),
              jnp.float32(0), iters)[0], shadow, pts)

    # full integrate
    def int_body(carry, i, p, v, s):
        g, k = carry
        cr = rowvol.corner_rows(p + i * 0.01, L)
        return rowvol.integrate_rows(g, k, cr, v, s, None, T)

    timed("integrate_rows chunk=4096",
          lambda p, v, s: jax.lax.scan(
              lambda c, i: (int_body(c, i, p, v, s), None),
              (geo, key), iters)[0], pts, vals, sem)

    def int_body_big(carry, i, p, v, s):
        g, k = carry
        cr = rowvol.corner_rows(p + i * 0.01, L)
        return rowvol.integrate_rows(g, k, cr, v, s, None, T, chunk=65536)

    timed("integrate_rows unchunked",
          lambda p, v, s: jax.lax.scan(
              lambda c, i: (int_body_big(c, i, p, v, s), None),
              (geo, key), iters)[0], pts, vals, sem)

    # build_shadow decomposition
    def reconcile_only(g):
        def body(c, i):
            num, w, _ = rowvol._reconcile(g + i * 0.0, None, L,
                                          want_key=False)
            return c + num[0, 0, 0] + w[0, 0, 0], None
        return jax.lax.scan(body, jnp.float32(0), iters)[0]

    timed("build_shadow: reconcile only", reconcile_only, geo)

    def full_shadow(g):
        def body(c, i):
            return c + jnp.float32(
                rowvol.build_shadow(g + i * 0.0, L)[0, 0]), None
        return jax.lax.scan(body, jnp.float32(0), iters)[0]

    timed("build_shadow: full", full_shadow, geo)


if __name__ == "__main__":
    main()
