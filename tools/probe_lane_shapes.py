"""Test the sublane-packing hypothesis: lane-select / lane-construct ops
on (n, t, 2, 128)-shaped tensors (second-minor extent 2 vs the TPU's
(8, 128) tile) vs the same work reshaped to 2-D (R, 128).

Run ON TPU: PYTHONPATH=/root/repo python tools/probe_lane_shapes.py
"""

import time

import numpy as np
import jax
import jax.numpy as jnp

N, P, T = 256 * 256, 9, 7
REPS = 8


def sync(x):
    return float(jnp.sum(x.astype(jnp.float32)))


def timed(label, fn, *args, reps=3):
    fn_j = jax.jit(fn)
    sync(fn_j(*args))
    best = 1e30
    for _ in range(reps):
        t0 = time.perf_counter()
        sync(fn_j(*args))
        best = min(best, time.perf_counter() - t0)
    print(f"{label:52s} {best / REPS * 1e3:8.2f} ms", flush=True)


def main():
    rng = np.random.RandomState(0)
    iters = jnp.arange(REPS, dtype=jnp.int32)

    # --- one-hot pick of 2 lanes from u32 rows -------------------------------
    R = N * P * 2
    rows4 = jnp.asarray(rng.randint(0, 1 << 31, (N, P, 2, 256),
                                    dtype=np.int64).astype(np.uint32))
    lane4 = jnp.asarray(rng.randint(0, 127, (N, P, 2)).astype(np.int32))

    def pick(rows, l0, l1):
        iota = jax.lax.broadcasted_iota(jnp.int32, rows.shape,
                                        rows.ndim - 1)
        h0 = iota == l0[..., None]
        h1 = iota == l1[..., None]
        z = jnp.zeros_like(rows)
        return (jnp.sum(jnp.where(h0, rows, z), axis=-1),
                jnp.sum(jnp.where(h1, rows, z), axis=-1))

    def run4(rows, lane):
        def body(c, i):
            g0, g1 = pick(rows, lane + i, lane + i + 1)
            return c + jnp.sum(g0 // 977) + jnp.sum(g1 // 977), None
        return jax.lax.scan(body, jnp.uint32(0), iters)[0]

    timed("u32 pick2 4-D (n,p,2,256)", run4, rows4, lane4)

    rows2 = rows4.reshape(R, 256)
    lane2 = jnp.broadcast_to(lane4[..., None],
                             (N, P, 2, 1)).reshape(R)

    def run2(rows, lane):
        def body(c, i):
            g0, g1 = pick(rows, lane + i, lane + i + 1)
            return c + jnp.sum(g0 // 977) + jnp.sum(g1 // 977), None
        return jax.lax.scan(body, jnp.uint32(0), iters)[0]

    timed("u32 pick2 2-D (R,256)", run2, rows2, lane2)

    # f32 weighted-dot pick (select+interp in one multiply-add)
    rowsf = rows2.view() if False else jnp.asarray(
        rng.rand(R, 256).astype(np.float32))
    w0 = jnp.asarray(rng.rand(R).astype(np.float32))

    def runf(rows, lane, w):
        def body(c, i):
            iota = jax.lax.broadcasted_iota(jnp.int32, rows.shape, 1)
            wvec = (jnp.where(iota == (lane + i)[:, None], w[:, None], 0.0)
                    + jnp.where(iota == (lane + i + 1)[:, None],
                                (1 - w)[:, None], 0.0))
            return c + jnp.sum(rows * wvec), None
        return jax.lax.scan(body, jnp.float32(0), iters)[0]

    timed("f32 weighted-dot pick 2-D (R,256)", runf, rowsf, lane2, w0)

    # --- two-lane update construction ---------------------------------------
    Rn = N * T * 2
    lanes4 = jnp.asarray(rng.randint(0, 126, (N, T, 2)).astype(np.int32))
    v4 = jnp.asarray(rng.rand(N, T, 2).astype(np.float32))

    def build4(lane, v):
        def body(c, i):
            l0 = lane + i
            iota = jax.lax.broadcasted_iota(jnp.int32,
                                            l0.shape + (128,), l0.ndim)
            vec = (jnp.where(iota == l0[..., None], v[..., None], 0.0)
                   + jnp.where(iota == (l0 + 1)[..., None],
                               (v * 2)[..., None], 0.0))
            upd = jnp.concatenate([vec, vec * 2, vec * 3, vec * 4],
                                  axis=-1)
            return c + jnp.sum(upd[..., ::97]), None
        return jax.lax.scan(body, jnp.float32(0), iters)[0]

    timed("two-lane construct 4-D (n,t,2,128)->concat 512", build4,
          lanes4, v4)

    lanes2 = lanes4.reshape(Rn)
    v2 = v4.reshape(Rn)

    def build2(lane, v):
        def body(c, i):
            l0 = lane + i
            iota = jax.lax.broadcasted_iota(jnp.int32, (Rn, 128), 1)
            vec = (jnp.where(iota == l0[:, None], v[:, None], 0.0)
                   + jnp.where(iota == (l0 + 1)[:, None],
                               (v * 2)[:, None], 0.0))
            upd = jnp.concatenate([vec, vec * 2, vec * 3, vec * 4],
                                  axis=-1)
            return c + jnp.sum(upd[:, ::97]), None
        return jax.lax.scan(body, jnp.float32(0), iters)[0]

    timed("two-lane construct 2-D (Rn,128)->concat 512", build2,
          lanes2, v2)

    # construction + scatter fused (the real integrate shape), 2-D
    V = 1404928
    geo = jnp.zeros((V, 512), jnp.float32)
    ridx = jnp.asarray(rng.randint(0, V, Rn).astype(np.int32))

    def build_scatter2(g, lane, v, idx):
        def body(gc, i):
            l0 = lane + i
            iota = jax.lax.broadcasted_iota(jnp.int32, (Rn, 128), 1)
            vec = (jnp.where(iota == l0[:, None], v[:, None], 0.0)
                   + jnp.where(iota == (l0 + 1)[:, None],
                               (v * 2)[:, None], 0.0))
            upd = jnp.concatenate([vec, vec * 2, vec * 3, vec * 4],
                                  axis=-1)
            return gc.at[idx + i].add(upd), None
        return jax.lax.scan(body, g, iters)[0]

    timed("construct 2-D + 512-lane scatter-add", build_scatter2,
          geo, lanes2, v2, ridx)


if __name__ == "__main__":
    main()
