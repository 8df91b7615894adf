"""Debug the slot shadow kernel on TPU at a tiny shape: print compiled
pltpu.roll semantics and the structure of any kernel-vs-XLA mismatches.

Run ON TPU: PYTHONPATH=/root/.axon_site:/root/repo python tools/probe_shadow_debug.py
"""

import numpy as np
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from segfusion_tpu.ops import rowvol
from segfusion_tpu.ops.pallas.shadow_build import build_shadow_pallas


def roll_semantics():
    x = jnp.arange(8 * 128, dtype=jnp.float32).reshape(8, 128)

    def k(x_ref, o_ref):
        o_ref[...] = pltpu.roll(x_ref[...], 1, 1)

    y = pl.pallas_call(
        k, out_shape=jax.ShapeDtypeStruct((8, 128), jnp.float32))(x)
    v = float(np.asarray(y)[0, 0])
    print(f"compiled pltpu.roll(x, 1)[0] = x[{int(v)}]  "
          f"({'jnp (l-s)' if v == 127 else 'forward (l+s)'})", flush=True)


def main():
    roll_semantics()

    shape = (6, 8, 40)
    L = rowvol.RowLayout.for_shape(shape)
    rng = np.random.RandomState(1)
    geo = rng.randn(L.geo_rows, 128).astype(np.float32) * 0.3
    g5 = geo.reshape(L.X, L.Y + 2, L.G, 8, 16)
    g5[:, 0] = 0.0
    g5[:, L.Y + 1] = 0.0
    for c in (2, 3, 6, 7):
        g5[:, L.Y, :, c] = 0.0
    gz, sz = (L.Z - 1) // 16, (L.Z - 1) % 16
    for c in (1, 3, 5, 7):
        g5[:, :, gz, c, sz] = 0.0
    g5[:, :, gz, :, sz + 1:] = 0.0
    if gz + 1 < L.G:
        g5[:, :, gz + 1:] = 0.0
    geo = jnp.asarray(g5.reshape(L.geo_rows, 128))

    want = np.asarray(jax.jit(rowvol.build_shadow,
                              static_argnums=(1, 2))(geo, L, "xla"))
    got = np.asarray(jax.jit(build_shadow_pallas,
                             static_argnums=(1, 2))(geo, L))
    diff = got != want
    print(f"total lanes {want.size}, differing {diff.sum()}", flush=True)
    if diff.any():
        w4 = want.reshape(L.X, L.Y, L.GK, 4, 32)
        g4 = got.reshape(L.X, L.Y, L.GK, 4, 32)
        d4 = w4 != g4
        print("mismatch count per component:",
              [int(d4[:, :, :, c, :].sum()) for c in range(4)], flush=True)
        print("mismatch count per y:",
              [int(d4[:, y].sum()) for y in range(L.Y)], flush=True)
        print("mismatch count per slot s:",
              [int(d4[..., s].sum()) for s in range(32)], flush=True)
        idx = np.argwhere(d4)[:6]
        for i in idx:
            x, y, gk, c, s = i
            print(f"  at x={x} y={y} gk={gk} c={c} s={s}: "
                  f"want {w4[tuple(i)]:08x} got {g4[tuple(i)]:08x}",
                  flush=True)


if __name__ == "__main__":
    main()
