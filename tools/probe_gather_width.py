"""Gather cost vs row width at the HEADLINE extraction's real scale --
the measurement behind the x-pair redundant-shadow lever.

Extraction today: TWO (m, 128) u32 gathers per (ray, sample) -- one per
x-corner -- at ~14 ns/row (PERFORMANCE.md). If the per-row cost is
issue-bound (flat in row WIDTH), a redundant 256-lane shadow whose row
(x, y_lo, zg) carries x's AND x+1's corner lanes would serve a sample
with ONE (m, 256) gather: same bytes, half the rows. This probe measures
(m, 128) / (m, 256) / (m, 512) u32 gathers with ray-clustered indices at
the headline's m (256^2 rays x 9 points), plus the 2x(m,128) baseline,
composed in a fori_loop (micro-loop timings of a lone gather overstate
throughput ~8x -- CLAUDE.md).

Run ON TPU: python tools/probe_gather_width.py
"""

import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))

REPS = 8
INNER = 8


def sync(x):
    import jax.numpy as jnp
    return float(jnp.sum(x.astype(jnp.float32)))


def mkidx(key, N, V):
    import jax
    import jax.numpy as jnp
    # ray-like locality: runs of ~9 consecutive samples whose rows drift
    # within a 64-row neighbourhood (the extraction's real index stream)
    base = jnp.repeat(jax.random.randint(key, (N // 9 + 1,), 0,
                                         max(V - 64, 1), jnp.int32), 9)[:N]
    jit = jax.random.randint(jax.random.fold_in(key, 1), (N,), 0, 64,
                             jnp.int32)
    return (base + jit) % V


def probe(V, m, width, two_gathers=False):
    import jax
    import jax.numpy as jnp

    shadow = jnp.arange(V * width, dtype=jnp.uint32).reshape(V, width)
    idx = mkidx(jax.random.PRNGKey(0), m, V)
    idx2 = mkidx(jax.random.PRNGKey(7), m, V)

    def run(shadow, idx, idx2):
        def body(k, acc):
            i1 = (idx + k) % V
            g = jnp.take(shadow, i1, axis=0)
            s = jnp.sum(g.astype(jnp.float32), axis=1)
            if two_gathers:
                i2 = (idx2 + k) % V
                g2 = jnp.take(shadow, i2, axis=0)
                s = s + jnp.sum(g2.astype(jnp.float32), axis=1)
            return acc + jnp.sum(s)
        return jax.lax.fori_loop(0, INNER, body, jnp.float32(0))

    fn = jax.jit(run)
    sync(fn(shadow, idx, idx2))
    best = 1e30
    for _ in range(REPS):
        t0 = time.perf_counter()
        sync(fn(shadow, idx, idx2))
        best = min(best, time.perf_counter() - t0)
    per = best / INNER
    rows = m * (2 if two_gathers else 1)
    tag = f"2x(m,128)" if two_gathers else f"1x(m,{width})"
    print(f"gather {tag:12s} V={V:8d} m={m}: {per * 1e3:8.2f} ms "
          f"({per / rows * 1e9:6.2f} ns/row, "
          f"{per / m * 1e9:6.2f} ns/sample)", flush=True)


def probe_scatter(V, M, width, dtype_name="bf16"):
    import jax
    import jax.numpy as jnp

    dt = jnp.bfloat16 if dtype_name == "bf16" else jnp.float32
    state = jnp.zeros((V, width), dt)
    idx = mkidx(jax.random.PRNGKey(3), M, V)
    upd = jnp.ones((M, width), jnp.float32)

    def run(state, idx, upd):
        def body(k, s):
            return s.at[(idx + k) % V].add(upd.astype(s.dtype))
        return jax.lax.fori_loop(0, INNER, body, state)

    fn = jax.jit(run, donate_argnums=(0,))
    state = fn(state, idx, upd)
    sync(state[0])
    best = 1e30
    for _ in range(REPS):
        t0 = time.perf_counter()
        state = fn(state, idx, upd)
        sync(state[0])
        best = min(best, time.perf_counter() - t0)
    per = best / INNER
    print(f"scatter-add {dtype_name} (M,{width:4d}) V={V:8d} M={M}: "
          f"{per * 1e3:8.2f} ms ({per / M * 1e9:6.2f} ns/row)",
          flush=True)


def main():
    m = 256 * 256 * 9            # headline extraction rows per frame
    V128 = 2809856               # key-shadow rows at 448^3 (GK layout)
    if os.environ.get("PROBE_TINY"):
        m, V128 = 4096, 8192
    V256 = V128                  # redundant shadow: same rows, 2x lanes
    probe(V128, m, 128, two_gathers=True)    # today's extraction
    probe(V128, m, 128)
    probe(V256, m, 256)
    probe(V256 // 2, m, 512)
    # scatter side: geo slot state at 448^3 is (5669888, 128) bf16 today;
    # an x-paired 256-lane layout would be (2834944, 256) with ~0.75x the
    # update rows. Measure per-row cost vs width at constant state bytes.
    VG = V128 * 2 if not os.environ.get("PROBE_TINY") else 16384
    probe_scatter(VG, 2 * m, 128)            # today's geo scatter rows
    probe_scatter(VG // 2, 2 * m, 256)       # same rows, 2x lanes
    probe_scatter(VG // 2, (2 * m) * 3 // 4, 256)  # x-pair expected rows


if __name__ == "__main__":
    main()
