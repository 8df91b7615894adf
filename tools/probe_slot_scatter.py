"""Probe the slot-layout scatter costs: 128-lane scatter-add/max with
ray-clustered row indices at bench scale, vs the current 512/256-lane row
ops, plus the (M,16,8)->(M,128) update-build reshape.

Run ON TPU: PYTHONPATH=/root/.axon_site:/root/repo python tools/probe_slot_scatter.py
"""

import time

import numpy as np
import jax
import jax.numpy as jnp

N, P, T = 256 * 256, 9, 7
FRAMES = 8
X = Y = Z = 448
G = -(-Z // 16)          # z-slot groups of 16 per row
ROWS_SLOT = X * Y * G    # 5.6M rows x 128 lanes x 4B = 2.87 GB


def ray_rows(rng, nrows):
    """Clustered slot rows mimicking the ray geometry (smooth surface)."""
    h = w = 256
    yy, xx = np.meshgrid(np.linspace(-1, 1, h), np.linspace(-1, 1, w),
                         indexing="ij")
    d = np.stack([xx * 0.4, yy * 0.4, np.ones_like(xx)], -1)
    d /= np.linalg.norm(d, axis=-1, keepdims=True)
    depth = 180 + 60 * np.sin(3 * xx) * np.cos(2 * yy)
    o = np.array([224.0, 224.0, 30.0])
    j = (np.arange(T) - T / 2) * 0.7
    pts = (o + d[..., None, :] * (depth[..., None, None] + j[:, None]))
    pts = pts.reshape(-1, 3)
    xi = np.clip(pts[:, 0].astype(np.int64), 0, X - 1)
    yi = np.clip(pts[:, 1].astype(np.int64), 0, Y - 1)
    zi = np.clip(pts[:, 2].astype(np.int64), 0, Z - 1)
    rows = (xi * Y + yi) * G + zi // 16
    rows = np.stack([rows, np.minimum(rows + Y * G, nrows - 1)],
                    axis=1).reshape(-1)     # 2 x-corners
    return jnp.asarray(rows.astype(np.int32) % nrows)


def bench(label, body, state, *args, reps=3):
    fn = jax.jit(body, donate_argnums=0)
    s = fn(state, *args)
    float(jnp.sum(s[0].astype(jnp.float32)))
    best = 1e30
    for _ in range(reps):
        t0 = time.perf_counter()
        s = fn(s, *args)
        float(jnp.sum(s[0].astype(jnp.float32)))
        best = min(best, time.perf_counter() - t0)
    print(f"{label:46s} {best / FRAMES * 1e3:8.2f} ms/frame", flush=True)
    return s


def main():
    rng = np.random.RandomState(0)
    rows = ray_rows(rng, ROWS_SLOT)
    M = rows.shape[0]
    print(f"M = {M} slot ops/frame, state rows {ROWS_SLOT}", flush=True)
    iters = jnp.arange(FRAMES, dtype=jnp.float32)

    geo = jax.jit(lambda: jnp.zeros((ROWS_SLOT, 128), jnp.float32))()
    upd = jax.jit(lambda: jnp.ones((M, 128), jnp.float32))()
    jax.block_until_ready((geo, upd))

    def scat_add(g, r, u):
        def body(c, i):
            return c.at[r + i.astype(jnp.int32) % 7].add(u), None
        return jax.lax.scan(body, g, iters)[0]

    geo = bench("slot scatter-add (M,128) f32", scat_add, geo, rows, upd)
    del geo, upd

    key = jax.jit(lambda: jnp.zeros((ROWS_SLOT // 2, 128), jnp.int32))()
    kupd = jax.jit(lambda: jnp.ones((M, 128), jnp.int32))()
    jax.block_until_ready((key, kupd))
    rows_k = rows % (ROWS_SLOT // 2)

    def scat_max(k, r, u):
        def body(c, i):
            return c.at[r + i.astype(jnp.int32) % 7].max(u), None
        return jax.lax.scan(body, k, iters)[0]

    key = bench("slot scatter-max (M,128) i32", scat_max, key, rows_k,
                kupd)
    del key, kupd

    # update-build: (M,8) values placed at slot offset via one-hot
    vals8 = jax.jit(lambda: jnp.ones((M, 8), jnp.float32))()
    slot = jnp.asarray((np.asarray(rows) % 16).astype(np.int32))
    jax.block_until_ready(vals8)

    def build(c, i, v8, s):
        mask = (jax.lax.broadcasted_iota(jnp.int32, (v8.shape[0], 16, 1),
                                         1) == s[:, None, None])
        u = jnp.where(mask, v8[:, None, :] + i, 0.0).reshape(-1, 128)
        return c + jnp.sum(u[:, ::31].astype(jnp.float32))

    def build_loop(v8, s):
        def body(c, i):
            return build(c, i, v8, s), None
        return jax.lax.scan(body, jnp.float32(0), iters)[0]

    fn = jax.jit(build_loop)
    float(fn(vals8, slot))
    best = 1e30
    for _ in range(3):
        t0 = time.perf_counter()
        float(fn(vals8, slot))
        best = min(best, time.perf_counter() - t0)
    print(f"{'update build (M,16,8)->(M,128)':46s} "
          f"{best / FRAMES * 1e3:8.2f} ms/frame", flush=True)


if __name__ == "__main__":
    main()
