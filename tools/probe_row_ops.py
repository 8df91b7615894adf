"""Probe XLA row (128-lane) gather/scatter on TPU.

If gathering/scattering whole (128,)-lane rows of a (V, 128) operand
costs ~one scalar-op per ROW (not per element), the volume can be laid
out z-major-in-lanes and every trilinear corner access grouped into rows:
3-6x fewer random-access ops on the fusion hot path. Round 1 only
measured tiny-window ops ((N,2) rows), which scalarise; 128-wide rows
aligned to the lane dimension may hit a vector path.

Run ON TPU: python tools/probe_row_ops.py
"""

import time

import numpy as np
import jax
import jax.numpy as jnp

REPS = 10


def sync(x):
    return float(jnp.sum(x if x.dtype in (jnp.float32, jnp.bfloat16)
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


def probe_row_gather(V, N, dtype=jnp.float32, width=128):
    table = jnp.ones((V, width), dtype)
    idx = jax.random.randint(jax.random.PRNGKey(0), (N,), 0, V, jnp.int32)

    def run(table, idx):
        def body(i, acc):
            g = jnp.take(table, (idx + i) % V, axis=0)
            return acc + jnp.sum(g, dtype=jnp.float32)
        return jax.lax.fori_loop(0, REPS, body, 0.0)

    dt = timed(run, table, idx)
    per_row = dt / REPS / N * 1e9
    print(f"  gather rows (V={V}, w={width}, {np.dtype(dtype).name}): "
          f"{per_row:.2f} ns/row = {per_row/width:.3f} ns/elem "
          f"({N*width*4*REPS/dt/2**30:.0f} GiB/s)", flush=True)


def probe_row_scatter_add(V, N, width=128):
    vol = jnp.zeros((V, width), jnp.float32)
    idx = jax.random.randint(jax.random.PRNGKey(1), (N,), 0, V, jnp.int32)
    upd = jnp.ones((N, width), jnp.float32)

    def run(vol, idx, upd):
        def body(i, v):
            return v.at[(idx + i) % V].add(upd)
        return jax.lax.fori_loop(0, REPS, body, vol)

    dt = timed(run, vol, idx, upd)
    per_row = dt / REPS / N * 1e9
    print(f"  scatter-add rows (V={V}, w={width}): {per_row:.2f} ns/row = "
          f"{per_row/width:.3f} ns/elem", flush=True)


def probe_row_scatter_max(V, N, width=128):
    vol = jnp.zeros((V, width), jnp.int32)
    idx = jax.random.randint(jax.random.PRNGKey(2), (N,), 0, V, jnp.int32)
    upd = jnp.ones((N, width), jnp.int32)

    def run(vol, idx, upd):
        def body(i, v):
            return v.at[(idx + i) % V].max(upd + i)
        return jax.lax.fori_loop(0, REPS, body, vol)

    dt = timed(run, vol, idx, upd)
    per_row = dt / REPS / N * 1e9
    print(f"  scatter-max rows int32 (V={V}, w={width}): {per_row:.2f} "
          f"ns/row = {per_row/width:.3f} ns/elem", flush=True)


def probe_correctness():
    V, N, width = 1024, 4096, 128
    rs = np.random.RandomState(0)
    idx = rs.randint(0, V, N).astype(np.int32)
    upd = rs.rand(N, width).astype(np.float32)
    want = np.zeros((V, width), np.float32)
    np.add.at(want, idx, upd)
    got = jnp.zeros((V, width), jnp.float32).at[jnp.asarray(idx)].add(
        jnp.asarray(upd))
    np.testing.assert_allclose(np.asarray(got), want, atol=1e-4)
    print("  correctness: row scatter-add matches np.add.at", flush=True)


if __name__ == "__main__":
    print("devices:", jax.devices(), flush=True)
    probe_correctness()
    print("== row gather ==", flush=True)
    probe_row_gather(448 * 448 * 4, 1 << 21)          # 448^3 volume, f32
    probe_row_gather(448 * 448 * 4, 1 << 21, jnp.uint32)
    probe_row_gather(65536, 1 << 21)
    probe_row_gather(448 * 448 * 4, 1 << 21, width=256)
    probe_row_gather(448 * 448 * 8, 1 << 21, width=64)
    print("== row scatter-add ==", flush=True)
    probe_row_scatter_add(448 * 448 * 4, 1 << 21)
    probe_row_scatter_add(65536, 1 << 21)
    probe_row_scatter_add(448 * 448 * 8, 1 << 21, width=64)
    print("== row scatter-max ==", flush=True)
    probe_row_scatter_max(448 * 448 * 4, 1 << 21)
    print("done", flush=True)
