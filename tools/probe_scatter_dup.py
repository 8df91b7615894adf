"""How does XLA TPU scatter-add cost depend on update-row structure?

The geo integrate is ONE (2m, 128) scatter-add with m = rays*tail
(~1.18M rows at 256^2/t9) into the 2.9 GB slot state. Along a ray,
consecutive tail samples usually hit the SAME geo row (z-groups are 16
slots; y_lo rarely steps), so many update rows are duplicates. If
scatter cost scales with the number of DISTINCT random rows (cache/HBM
locality), merging in-ray duplicates (sum into the first occurrence,
re-target the rest at a dump row with zero value) buys the gap to the
floor without changing the op shape. If cost is per-update-row serial,
merging is useless and only real compaction (fewer rows) helps.

Measures scatter-add of (M, 128) f32 updates into (R, 128) state for:
  A  fully random rows
  B  in-run duplicates: runs of L equal random rows (ray-like locality)
  C  50% of rows re-targeted at row 0 (dump) with zero values
  D  90% dump
  E  M/3 rows (real compaction, random)  -- the payoff ceiling

Run ON TPU: python tools/probe_scatter_dup.py
"""

import time

import numpy as np
import jax
import jax.numpy as jnp


def timed(name, fn, *args):
    out = fn(*args)
    jnp.sum(out[0] if isinstance(out, tuple) else out).block_until_ready()
    best = 1e30
    for _ in range(5):
        t0 = time.perf_counter()
        out = fn(*args)
        float(jnp.sum((out[0] if isinstance(out, tuple) else out)[::4096, ::64]))
        best = min(best, time.perf_counter() - t0)
    print(f"{name:34s}: {best * 1e3:8.2f} ms")
    return best


def main():
    R = 5_644_800            # geo_rows at 448^3
    M = 1_179_648            # 2 * 65536 * 9
    rng = np.random.RandomState(0)

    state = jnp.zeros((R, 128), jnp.float32)
    upd = jnp.asarray(rng.rand(M, 128).astype(np.float32))

    rows_rand = jnp.asarray(rng.randint(0, R, size=M).astype(np.int32))

    L = 6                    # duplicates per run (ray-locality guess)
    base = rng.randint(0, R, size=(M + L - 1) // L).astype(np.int32)
    rows_runs = jnp.asarray(np.repeat(base, L)[:M])

    def dumped(frac):
        keep = rng.rand(M) > frac
        rows = np.where(keep, np.asarray(rows_rand), 0).astype(np.int32)
        vals = jnp.where(jnp.asarray(keep)[:, None], upd, 0.0)
        return jnp.asarray(rows), vals

    rows_d50, upd_d50 = dumped(0.5)
    rows_d90, upd_d90 = dumped(0.9)

    Mc = M // 3
    rows_c = jnp.asarray(rng.randint(0, R, size=Mc).astype(np.int32))
    upd_c = upd[:Mc]

    @jax.jit
    def scat(state, rows, vals):
        return state.at[rows].add(vals)

    timed("A random rows", scat, state, rows_rand, upd)
    timed(f"B runs of {L}", scat, state, rows_runs, upd)
    timed("C 50% dump-row zeros", scat, state, rows_d50, upd_d50)
    timed("D 90% dump-row zeros", scat, state, rows_d90, upd_d90)
    timed("E compacted M/3 random", scat, state, rows_c, upd_c)

    # same for the scatter-max key op shape
    K = 2_809_856
    kstate = jnp.zeros((K, 128), jnp.int32)
    kupd = jnp.asarray(rng.randint(0, 1 << 20, size=(M, 128)).astype(np.int32))
    krows = jnp.asarray(rng.randint(0, K, size=M).astype(np.int32))

    @jax.jit
    def scatmax(state, rows, vals):
        return state.at[rows].max(vals)

    timed("F key scatter-max random", scatmax, kstate, krows, kupd)

    # Same structure question for the extraction GATHER: consecutive
    # tail samples read the same shadow row (shadow z-groups span 32
    # voxels), so if gather cost follows distinct rows, deduping in-tail
    # gather rows (gather once, fan out with t-1 selects) pays the same
    # way the scatter merge would.
    S = 2_809_856            # shadow_rows at 448^3
    src = jnp.asarray(rng.randint(0, 1 << 30, (S, 128)).astype(np.int32))

    @jax.jit
    def gath(src, rows):
        return src[rows]

    g_rand = jnp.asarray(rng.randint(0, S, size=M).astype(np.int32))
    gbase = rng.randint(0, S, size=(M + L - 1) // L).astype(np.int32)
    g_runs = jnp.asarray(np.repeat(gbase, L)[:M])
    keepg = rng.rand(M) > 0.5
    g_d50 = jnp.asarray(np.where(keepg, np.asarray(g_rand), 0)
                        .astype(np.int32))
    g_c = jnp.asarray(rng.randint(0, S, size=M // 3).astype(np.int32))

    timed("G gather random rows", gath, src, g_rand)
    timed(f"H gather runs of {L}", gath, src, g_runs)
    timed("I gather 50% row-0", gath, src, g_d50)
    timed("J gather compacted M/3", gath, src, g_c)


if __name__ == "__main__":
    main()
