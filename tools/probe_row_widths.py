"""Probe round 3: row-op costs vs lane width + index locality + scan/donation.

Informs the row-layout integration redesign:
  * scatter-add f32 rows at w=128/256/512 (num|w interleave + y-pairing)
  * scatter-max i32 rows at w=128/256
  * gather u32/f32 rows at w=128/256/512, random vs clustered (ray
    locality) indices
  * donated row-state scatter inside lax.scan (in-place check: time for
    16 chained scatters should be ~16x one, not show copies)

Run ON TPU: python tools/probe_row_widths.py
"""

import time

import numpy as np
import jax
import jax.numpy as jnp

REPS = 10


def sync(x):
    return float(jnp.sum(x if x.dtype == jnp.float32
                         else x.astype(jnp.float32)))


def timed(fn, *args, reps=3):
    fn_j = jax.jit(fn)
    sync(fn_j(*args))
    best = 1e30
    for _ in range(reps):
        t0 = time.perf_counter()
        sync(fn_j(*args))
        best = min(best, time.perf_counter() - t0)
    return best


def mkidx(key, N, V, clustered):
    if not clustered:
        return jax.random.randint(key, (N,), 0, V, jnp.int32)
    # ray-like locality: blocks of 28 consecutive events within a 64-row
    # neighbourhood that drifts smoothly across the volume
    base = jnp.repeat(jax.random.randint(key, (N // 28 + 1,), 0,
                                         max(V - 64, 1), jnp.int32), 28)[:N]
    jit = jax.random.randint(jax.random.fold_in(key, 1), (N,), 0, 64,
                             jnp.int32)
    return (base + jit) % V


def probe_scatter_add(V, N, width, clustered=False):
    vol = jnp.zeros((V, width), jnp.float32)
    idx = mkidx(jax.random.PRNGKey(1), N, V, clustered)
    upd = jnp.ones((N, width), jnp.float32)

    def run(vol, idx, upd):
        def body(i, v):
            return v.at[(idx + i) % V].add(upd)
        return jax.lax.fori_loop(0, REPS, body, vol)

    dt = timed(run, vol, idx, upd)
    tag = "clustered" if clustered else "random"
    print(f"  scatter-add f32 w={width} V={V} ({tag}): "
          f"{dt/REPS/N*1e9:.2f} ns/row", flush=True)


def probe_scatter_max(V, N, width):
    vol = jnp.zeros((V, width), jnp.int32)
    idx = mkidx(jax.random.PRNGKey(2), N, V, True)
    upd = jnp.ones((N, width), jnp.int32)

    def run(vol, idx, upd):
        def body(i, v):
            return v.at[(idx + i) % V].max(upd + i)
        return jax.lax.fori_loop(0, REPS, body, vol)

    dt = timed(run, vol, idx, upd)
    print(f"  scatter-max i32 w={width} V={V} (clustered): "
          f"{dt/REPS/N*1e9:.2f} ns/row", flush=True)


def probe_gather(V, N, width, dtype, clustered):
    table = jnp.ones((V, width), dtype)
    idx = mkidx(jax.random.PRNGKey(3), N, V, clustered)

    def run(table, idx):
        def body(i, acc):
            g = jnp.take(table, (idx + i) % V, axis=0)
            return acc + jnp.sum(g, dtype=jnp.float32)
        return jax.lax.fori_loop(0, REPS, body, 0.0)

    dt = timed(run, table, idx)
    tag = "clustered" if clustered else "random"
    print(f"  gather {np.dtype(dtype).name} w={width} V={V} ({tag}): "
          f"{dt/REPS/N*1e9:.2f} ns/row", flush=True)


def probe_scan_donation():
    V, N, width = 448 * 448 * 4, 1 << 20, 128
    idx = mkidx(jax.random.PRNGKey(4), N, V, True)
    upd = jnp.ones((N, width), jnp.float32)

    @jax.jit
    def one(vol, idx, upd):
        return vol.at[idx].add(upd)

    def scan16(vol, idx, upd):
        def body(v, i):
            return v.at[(idx + i) % V].add(upd), ()
        v, _ = jax.lax.scan(body, vol, jnp.arange(16))
        return v

    vol = jnp.zeros((V, width), jnp.float32)
    d1 = timed(one, vol, idx, upd)
    d16 = timed(scan16, vol, idx, upd)
    print(f"  1 scatter: {d1*1e3:.1f} ms; scan of 16: {d16*1e3:.1f} ms "
          f"(ratio {d16/max(d1,1e-9):.1f}, want ~16 => in-place)",
          flush=True)


if __name__ == "__main__":
    print("devices:", jax.devices(), flush=True)
    V = 448 * 448 * 4
    V2 = 448 * 224 * 4
    N = 1 << 20
    print("== scatter-add widths ==", flush=True)
    probe_scatter_add(V, N, 128, clustered=False)
    probe_scatter_add(V, N, 128, clustered=True)
    probe_scatter_add(V2, N, 256, clustered=True)
    probe_scatter_add(V2, N, 512, clustered=True)
    print("== scatter-max widths ==", flush=True)
    probe_scatter_max(V, N, 128)
    probe_scatter_max(V2, N, 256)
    print("== gather widths ==", flush=True)
    probe_gather(V, N, 128, jnp.uint32, False)
    probe_gather(V, N, 128, jnp.uint32, True)
    probe_gather(V2, N, 256, jnp.uint32, True)
    probe_gather(V2, N, 512, jnp.uint32, True)
    probe_gather(V2, N, 256, jnp.float32, True)
    print("== scan donation ==", flush=True)
    probe_scan_donation()
    print("done", flush=True)
