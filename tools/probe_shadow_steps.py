"""Break build_shadow (85 ms/frame at 448^3) into sub-steps to find the
relayout hotspots: zmerge half-shifts, component slicing + y-combine,
f16 packing, stride-64 block interleave, final stack/reshape.

Run ON TPU: PYTHONPATH=/root/repo python tools/probe_shadow_steps.py
"""

import time

import jax
import jax.numpy as jnp

from segfusion_tpu.ops import rowvol

SHAPE = (448, 448, 448)
FRAMES = 8
L = rowvol.RowLayout.for_shape(SHAPE)
X, Q, ZB0, ZB1 = L.X, L.Q, L.ZB0, L.ZB1


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
    print(f"{label:46s} {best / FRAMES * 1e3:8.2f} ms/frame", flush=True)


def frames(body, consume):
    def run(*args):
        def f(c, i):
            return c + consume(body(i, *args)), None
        return jax.lax.scan(f, jnp.float32(0),
                            jnp.arange(FRAMES, dtype=jnp.float32))[0]
    return run


def main():
    geo = jnp.zeros((L.rows, 512), jnp.float32)
    d = jnp.zeros((X, Q, ZB0, 4, 128), jnp.float32)
    p128 = jnp.zeros((X, Q, ZB0, 128), jnp.uint32)

    def copy(g, cy, cz):
        off = cy * X * Q * (ZB0 + ZB1) + cz * X * Q * ZB0
        nblk = ZB1 if cz else ZB0
        return g[off:off + X * Q * nblk].reshape(X, Q, nblk, 4, 128)

    def zmerge(s0, s1):
        lo, hi = s1[..., :64], s1[..., 64:]
        addlow = jnp.pad(hi, ((0, 0), (0, 0),
                              (1, max(ZB0 - ZB1 - 1, 0)),
                              (0, 0), (0, 0)))[:, :, :ZB0]
        addhigh = jnp.pad(lo, ((0, 0), (0, 0), (0, ZB0 - ZB1),
                               (0, 0), (0, 0)))
        return s0 + jnp.concatenate([addlow, addhigh], axis=-1)

    timed("zmerge x2 (half-shift adds)",
          frames(lambda i, g: (zmerge(copy(g, 0, 0), copy(g, 0, 1)),
                               zmerge(copy(g, 1, 0), copy(g, 1, 1))),
                 lambda t: t[0][0, 0, 0, 0, 0] + t[1][0, 0, 0, 0, 0]),
          geo)

    def comp(dd, i):
        return dd[:, :, :, i, :]

    def qshift(a, s):
        if s == 1:
            return jnp.pad(a, ((0, 0), (1, 0), (0, 0), (0, 0)))[:, :Q]
        return jnp.pad(a, ((0, 0), (0, 1), (0, 0), (0, 0)))[:, 1:]

    def pairs(d0, d1):
        return [
            (comp(d0, 0) + qshift(comp(d1, 1), +1),
             comp(d0, 2) + qshift(comp(d1, 3), +1)),
            (comp(d0, 1) + comp(d1, 0), comp(d0, 3) + comp(d1, 2)),
            (comp(d1, 0) + comp(d0, 1), comp(d1, 2) + comp(d0, 3)),
            (comp(d1, 1) + qshift(comp(d0, 0), -1),
             comp(d1, 3) + qshift(comp(d0, 2), -1)),
        ]

    timed("pairs (comp slice + qshift + add) x8",
          frames(lambda i, dd: pairs(dd + i, dd * 2),
                 lambda ps: sum(a[0, 0, 0, 0] + b[0, 0, 0, 0]
                                for a, b in ps)),
          d)

    timed("pack16 x4",
          frames(lambda i, dd: [rowvol._pack16(comp(dd, 0) + i,
                                               comp(dd, 2))
                                for _ in range(4)],
                 lambda ps: sum(x[0, 0, 0, 0] for x in ps).astype(
                     jnp.float32)),
          d)

    def blocks64(p):
        nxt = jnp.pad(p, ((0, 0), (0, 0), (0, 1), (0, 0)))[:, :, 1:]
        odd = jnp.concatenate([p[..., 64:], nxt[..., :64]], axis=-1)
        return jnp.stack([p, odd], axis=3).reshape(X, Q, 2 * ZB0, 128)

    timed("blocks64 x4 (stride-64 interleave)",
          frames(lambda i, pp: [blocks64(pp + jnp.uint32(1))
                                for _ in range(4)],
                 lambda bs: sum(x[0, 0, 0, 0] for x in bs).astype(
                     jnp.float32)),
          p128)

    def final(b):
        sh0 = jnp.concatenate([b, b], axis=-1)
        sh1 = jnp.concatenate([b, b], axis=-1)
        return jnp.stack([sh0, sh1], axis=0).reshape(L.shadow_rows, 256)

    b = jnp.zeros((X, Q, 2 * ZB0, 128), jnp.uint32)
    timed("final concat+stack+reshape",
          frames(lambda i, bb: final(bb + jnp.uint32(1)),
                 lambda s: s[0, 0].astype(jnp.float32)),
          b)

    timed("build_shadow total",
          frames(lambda i, g: rowvol.build_shadow(g + i * 0.0, L),
                 lambda s: s[0, 0].astype(jnp.float32)),
          geo)


if __name__ == "__main__":
    main()
