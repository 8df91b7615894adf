"""Measure composition overhead in the per-frame scan: does combining
the Pallas shadow read with the in-place scatters force XLA to copy the
multi-GB carry each frame?

Run ON TPU: PYTHONPATH=/root/.axon_site:/root/repo python tools/probe_fused_loop.py
"""

import time

import numpy as np
import jax
import jax.numpy as jnp

from segfusion_tpu.ops import rowvol
from segfusion_tpu.ops.pallas.shadow_build import build_shadow_pallas

SHAPE = (448, 448, 448)
N, P, T = 256 * 256, 9, 7
FRAMES = 8


def main():
    L = rowvol.RowLayout.for_shape(SHAPE)
    rng = np.random.RandomState(0)
    sg = jnp.asarray(rng.randint(0, L.geo_rows, N * T * 2).astype(np.int32))
    sk = jnp.asarray(rng.randint(0, L.key_rows, N * T * 2).astype(np.int32))
    gr = jnp.asarray(rng.randint(0, L.shadow_rows,
                                 N * P * 2).astype(np.int32))
    upd = jnp.ones((N * T * 2, 128), jnp.float32)
    kupd = jnp.ones((N * T * 2, 128), jnp.int32)
    iters = jnp.arange(FRAMES, dtype=jnp.float32)

    def timed(label, body):
        def run(geo, key):
            def f(carry, i):
                g, k, acc = carry
                g, k, acc = body(g, k, acc, i)
                return (g, k, acc), None
            (g, k, acc), _ = jax.lax.scan(f, (geo, key, jnp.float32(0)),
                                          iters)
            return g, k, acc

        fn = jax.jit(run, donate_argnums=(0, 1))
        geo = jax.jit(lambda: jnp.zeros((L.geo_rows, 128), jnp.float32))()
        key = jax.jit(lambda: jnp.zeros((L.key_rows, 128), jnp.int32))()
        out = fn(geo, key)
        float(out[2])
        best = 1e30
        for _ in range(3):
            t0 = time.perf_counter()
            out = fn(out[0], out[1])
            float(out[2])
            best = min(best, time.perf_counter() - t0)
        print(f"{label:44s} {best / FRAMES * 1e3:8.2f} ms/frame",
              flush=True)

    def scat(g, k, acc, i):
        g = g.at[sg + i.astype(jnp.int32) % 3].add(upd)
        k = k.at[sk + i.astype(jnp.int32) % 3].max(kupd)
        return g, k, acc

    timed("scatters only", scat)

    def shad(g, k, acc, i):
        g = g.at[i.astype(jnp.int32) % 8, 0].add(1e-12)
        s = build_shadow_pallas(g, L)
        return g, k, acc + s[0, 0].astype(jnp.float32)

    timed("shadow only", shad)

    def both(g, k, acc, i):
        s = build_shadow_pallas(g, L)
        acc = acc + s[0, 0].astype(jnp.float32)
        g = g.at[sg + i.astype(jnp.int32) % 3].add(upd)
        k = k.at[sk + i.astype(jnp.int32) % 3].max(kupd)
        return g, k, acc

    timed("shadow + scatters", both)

    def full(g, k, acc, i):
        s = build_shadow_pallas(g, L)
        rows = jnp.take(s, (gr + i.astype(jnp.int32)) % L.shadow_rows,
                        axis=0)
        acc = acc + jnp.sum(rows[:, 0].astype(jnp.float32)) * 1e-9
        g = g.at[sg + i.astype(jnp.int32) % 3].add(upd)
        k = k.at[sk + i.astype(jnp.int32) % 3].max(kupd)
        return g, k, acc

    timed("shadow + gather + scatters", full)


if __name__ == "__main__":
    main()
