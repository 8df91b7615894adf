"""Per-stage timing of the row-layout hot path at bench shape (448^3
volume, 256^2 rays, p=9, t=7) on the real TPU.

Each stage is timed as a lax.scan over FRAMES (scan-amortised; one
dispatch per measurement, scalar readback to force completion -- the
axon tunnel's block_until_ready does not synchronize). Points get a
per-iteration offset so nothing constant-folds.

Run ON TPU: python tools/probe_row_stages.py
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
    return float(jnp.sum(x.astype(jnp.float32)))


def timed(label, fn, *args, reps=3):
    fn_j = jax.jit(fn)
    out = fn_j(*args)
    sync(out)
    best = 1e30
    for _ in range(reps):
        t0 = time.perf_counter()
        sync(fn_j(*args))
        best = min(best, time.perf_counter() - t0)
    ms = best / FRAMES * 1e3
    print(f"{label:42s} {ms:8.2f} ms/frame", flush=True)
    return ms


def main():
    L = rowvol.RowLayout.for_shape(SHAPE)
    print(f"layout: rows={L.rows} ({L.rows*2048/2**30:.2f} GB geo, "
          f"{L.rows*1024/2**30:.2f} GB key), shadow_rows={L.shadow_rows} "
          f"({L.shadow_rows*1024/2**30:.2f} GB)", flush=True)

    rng = np.random.RandomState(0)
    geo = jnp.zeros((L.rows, 512), jnp.float32)
    key = jnp.zeros((L.rows, 256), jnp.int32)
    pts = jnp.asarray(
        rng.rand(N, P, 3).astype(np.float32) * (np.asarray(SHAPE) - 2))
    vals = jnp.asarray(rng.randn(N, T).astype(np.float32) * 0.05)
    sem = jnp.asarray(rng.randint(1, 1 << 20, N).astype(np.int32))
    iters = jnp.arange(FRAMES, dtype=jnp.float32)

    def scan_frames(body, init):
        def run(*args):
            out, _ = jax.lax.scan(lambda c, i: (body(c, i, *args), None),
                                  init(*args), iters)
            return jax.tree_util.tree_leaves(out)[0]
        return run

    # corner math only
    timed("corner_rows (index math)",
          scan_frames(lambda c, i, p: c + jnp.float32(jnp.sum(
              rowvol.corner_rows(p + i * 0.01, L).s_rows) % 97),
              lambda p: jnp.float32(0.0)), pts)

    # shadow build only
    timed("build_shadow (dense reconcile+pack)",
          scan_frames(lambda c, i, g: c + jnp.float32(
              rowvol.build_shadow(g + i * 0.0, L)[0, 0]),
              lambda g: jnp.float32(0.0)), geo)

    # extraction only (shadow built once outside)
    shadow = jax.jit(rowvol.build_shadow, static_argnums=1)(geo, L)

    def ex_body(c, i, sh, p):
        cr = rowvol.corner_rows(p + i * 0.01, L)
        fv, fw = rowvol.extract_rows(sh, cr, 0.1, -1.0)
        return c + jnp.sum(fv) * 1e-9

    timed("extract_rows (gather, chunked)",
          scan_frames(ex_body, lambda sh, p: jnp.float32(0.0)), shadow, pts)

    # integrate geo only
    def int_geo_body(carry, i, p, v):
        g, k = carry
        cr = rowvol.corner_rows(p + i * 0.01, L)
        g, k = rowvol.integrate_rows(g, k, cr, v, None, None, T)
        return (g, k)

    timed("integrate_rows geo-only (512-lane add)",
          scan_frames(int_geo_body, lambda p, v: (geo, key)), pts, vals)

    # integrate geo + key
    def int_full_body(carry, i, p, v, s):
        g, k = carry
        cr = rowvol.corner_rows(p + i * 0.01, L)
        g, k = rowvol.integrate_rows(g, k, cr, v, s, None, T)
        return (g, k)

    timed("integrate_rows geo+key (add + max)",
          scan_frames(int_full_body, lambda p, v, s: (geo, key)),
          pts, vals, sem)

    # full fuse-shaped step (no net): shadow + extract + integrate
    def full_body(carry, i, p, v, s):
        g, k = carry
        cr = rowvol.corner_rows(p + i * 0.01, L)
        sh = rowvol.build_shadow(g, L)
        fv, fw = rowvol.extract_rows(sh, cr, 0.1, -1.0)
        g, k = rowvol.integrate_rows(g, k, cr, v + fv[:, :T] * 0.0, s,
                                     None, T)
        return (g, k)

    timed("full step (shadow+extract+integrate)",
          scan_frames(full_body, lambda p, v, s: (geo, key)),
          pts, vals, sem)


if __name__ == "__main__":
    main()
