"""Validate + time the full-128-lane shadow kernel on TPU: compiled
output vs the XLA reference on a reachable random state, then
dependency-chained timings across TY tiles.

Run ON TPU: python tools/probe_shadow_v2.py
"""

import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)),
                                ".."))

import jax
import jax.numpy as jnp

from segfusion_tpu.ops import rowvol
from segfusion_tpu.ops.pallas import shadow_build as sb


def reachable_state(L, seed=0):
    """Random canonical volume -> slot state -> one random slot scatter
    (keeps pad rows / dead comps zero like real writers)."""
    rng = np.random.RandomState(seed)
    num = rng.randn(L.X, L.Y, L.Z).astype(np.float32) * 0.05
    w = rng.rand(L.X, L.Y, L.Z).astype(np.float32) * 3.0
    key = rng.randint(0, 1 << 20, (L.X, L.Y, L.Z)).astype(np.int32)
    geo, _ = jax.jit(rowvol.rows_from_volume, static_argnums=3)(
        jnp.asarray(num), jnp.asarray(w), jnp.asarray(key), L)
    return geo


def main():
    # small correctness check first (fits quickly)
    Ls = rowvol.RowLayout.for_shape((24, 40, 48))
    geo_s = reachable_state(Ls)
    ref = jax.jit(rowvol.build_shadow, static_argnums=(1, 2))(
        geo_s, Ls, "xla")
    got = jax.jit(sb.build_shadow_pallas, static_argnums=(1,))(geo_s, Ls)
    same = bool(jnp.all(ref == got))
    print(f"small-shape compiled == XLA: {same}", flush=True)
    if not same:
        bad = int(jnp.sum(ref != got))
        print(f"  MISMATCH lanes: {bad}/{ref.size}")
        idx = np.argwhere(np.asarray(ref != got))[:5]
        for r, c in idx:
            print(f"   row {r} lane {c}: ref {np.asarray(ref)[r,c]:#x} "
                  f"got {np.asarray(got)[r,c]:#x}")
        return

    # bench-shape timing
    L = rowvol.RowLayout.for_shape((448, 448, 448))
    geo = jax.random.uniform(jax.random.PRNGKey(0), (L.geo_rows, 128),
                             jnp.float32)
    iters = 8

    def chain(fn):
        @jax.jit
        def loop(geo):
            acc = jnp.uint32(0)
            for _ in range(iters):
                out = fn(geo)
                acc = acc ^ out[0, 0]
                geo = geo + (acc % 2).astype(jnp.float32) * 1e-30
            return geo, acc
        return loop

    for ty in (16, 28, 56):
        try:
            loop = chain(lambda g, t=ty: sb.build_shadow_pallas(
                g, L, max_ty=t))
            g, a = loop(geo)
            float(jnp.sum(g[:4]))
            t0 = time.perf_counter()
            g, a = loop(geo)
            float(jnp.sum(g[:4]) + a.astype(jnp.float32))
            dt = (time.perf_counter() - t0) / iters
            print(f"v2 kernel TY={ty:3d}: {dt*1e3:8.2f} ms/call",
                  flush=True)
        except Exception as e:
            print(f"  TY={ty} failed: {type(e).__name__}", flush=True)


if __name__ == "__main__":
    main()
