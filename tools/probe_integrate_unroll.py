"""Compare integrate_rows chunk-loop strategies at bench shape with
donated state (no captured constants): unrolled python chunks (new) vs
single unchunked scatter, against the raw-scatter floor.

Run ON TPU: PYTHONPATH=/root/.axon_site:/root/repo python tools/probe_integrate_unroll.py
"""

import time

import numpy as np
import jax
import jax.numpy as jnp

from segfusion_tpu.ops import rowvol

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


def bench(label, fn, geo, key, *args, reps=3):
    fn_j = jax.jit(fn, donate_argnums=(0, 1))
    g, k = fn_j(geo, key, *args)
    float(jnp.sum(g[0]))
    best = 1e30
    for _ in range(reps):
        t0 = time.perf_counter()
        g, k = fn_j(g, k, *args)
        float(jnp.sum(g[0]))
        best = min(best, time.perf_counter() - t0)
    print(f"{label:52s} {best / FRAMES * 1e3:8.2f} ms/frame", flush=True)
    return g, k


def main():
    L = rowvol.RowLayout.for_shape(SHAPE)
    rng = np.random.RandomState(0)
    pts = ray_points(rng)
    geo = jnp.zeros((L.rows, 512), jnp.float32)
    key = jnp.zeros((L.key_rows, 128), jnp.int32)
    vals = jnp.asarray(rng.randn(N, T).astype(np.float32) * 0.05)
    sem = jnp.asarray(rng.randint(1, 1 << 20, N).astype(np.int32))
    cr = jax.jit(rowvol.corner_rows, static_argnums=1)(pts, L)
    cr = jax.tree_util.tree_map(jnp.asarray, cr)
    iters = jnp.arange(FRAMES, dtype=jnp.float32)

    def frames_loop(integrate):
        def run(geo, key, cr, vals, sem):
            def body(carry, i):
                g, k = carry
                return integrate(g, k, cr, vals + i * 1e-4, sem), None
            (g, k), _ = jax.lax.scan(body, (geo, key), iters)
            return g, k
        return run

    for label, chunk in [("unrolled chunks 4096", 4096),
                         ("unrolled chunks 8192", 8192),
                         ("unrolled chunks 16384", 16384),
                         ("single scatter (unchunked)", 65536)]:
        geo, key = bench(
            label,
            frames_loop(lambda g, k, c, v, s, ch=chunk:
                        rowvol.integrate_rows(g, k, c, v, s, None, T,
                                              chunk=ch)),
            geo, key, cr, vals, sem)

    # geo-only (no semantic scatter-max)
    geo, key = bench(
        "unrolled 8192, no sem scatter",
        frames_loop(lambda g, k, c, v, s:
                    (rowvol.integrate_rows(g, k, c, v, None, None, T,
                                           chunk=8192)[0], k)),
        geo, key, cr, vals, sem)


if __name__ == "__main__":
    main()
