"""Pallas caps probe 3: multi-dim strided-window DMA (HBM -> VMEM).

Gates the z-masked dirty-shadow rebuild (PERFORMANCE.md "staged
candidate"): rebuilding only a tile's z-footprint needs a DMA of a
(TY+2, Gb, 128) window out of the geo state viewed as (rows_y, G, 128)
-- a 2-D-strided descriptor with a dynamic offset on BOTH major axes.
Questions:
  1. does it lower + run at all (Mosaic window copy)?
  2. what does it cost vs the same bytes contiguous? Strided copies may
     pay per-segment overhead (~2-3 us/copy issue is known; segment
     bursts here are Gb*512 B) -- if a (58, 7, 128) window costs >>
     (58*7, 128) contiguous, the z-masked rebuild can't pay.

Run ON TPU: python tools/probe_pallas_caps3.py
"""

import functools
import time

import numpy as np
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _win_kernel(off_ref, x_hbm, o_ref, scratch, sem, *, R, WY, WG, REPS):
    def body(k, _):
        cp = pltpu.make_async_copy(
            x_hbm.at[pl.ds(off_ref[2 * k], WY), pl.ds(off_ref[2 * k + 1],
                                                      WG), :],
            scratch, sem)
        cp.start()
        cp.wait()
        return 0
    jax.lax.fori_loop(0, REPS, body, 0)
    o_ref[...] = scratch[0]


def _flat_kernel(off_ref, x_hbm, o_ref, scratch, sem, *, R, WN, REPS):
    def body(k, _):
        cp = pltpu.make_async_copy(
            x_hbm.at[pl.ds(off_ref[2 * k], WN), :], scratch, sem)
        cp.start()
        cp.wait()
        return 0
    jax.lax.fori_loop(0, REPS, body, 0)
    o_ref[...] = scratch[...]


def main():
    # geo-state-like shapes: Y+2 = 450 y-rows per x, G = 28 z-groups
    RY, G = 8 * 450, 28          # 8 x-slabs worth
    WY, WG = 58, 7               # (TY+2, Gb) window
    REPS = 64
    rng = np.random.RandomState(0)
    x3 = jnp.asarray(rng.rand(RY, G, 128).astype(np.float32))
    x2 = x3.reshape(RY * G, 128)

    offs = np.zeros(2 * REPS, np.int32)
    offs[0::2] = rng.randint(0, RY - WY, REPS)
    offs[1::2] = rng.randint(0, G - WG, REPS)
    offs = jnp.asarray(offs)

    interp = jax.default_backend() != "tpu"   # CPU: functional check only
    win = pl.pallas_call(
        functools.partial(_win_kernel, R=RY, WY=WY, WG=WG, REPS=REPS),
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1, grid=(1,),
            in_specs=[pl.BlockSpec(memory_space=pl.ANY)],
            out_specs=pl.BlockSpec((WG, 128), lambda i, s: (0, 0)),
            scratch_shapes=[pltpu.VMEM((WY, WG, 128), jnp.float32),
                            pltpu.SemaphoreType.DMA]),
        out_shape=jax.ShapeDtypeStruct((WG, 128), jnp.float32),
        interpret=interp,
    )

    offs_f = np.zeros(2 * REPS, np.int32)
    offs_f[0::2] = rng.randint(0, RY * G - WY * WG, REPS)
    offs_f = jnp.asarray(offs_f)
    WN = WY * WG
    flat = pl.pallas_call(
        functools.partial(_flat_kernel, R=RY * G, WN=WN, REPS=REPS),
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1, grid=(1,),
            in_specs=[pl.BlockSpec(memory_space=pl.ANY)],
            out_specs=pl.BlockSpec((WN, 128), lambda i, s: (0, 0)),
            scratch_shapes=[pltpu.VMEM((WN, 128), jnp.float32),
                            pltpu.SemaphoreType.DMA]),
        out_shape=jax.ShapeDtypeStruct((WN, 128), jnp.float32),
        interpret=interp,
    )

    # correctness first (one strided window, interpret-checked vs numpy)
    try:
        got = np.asarray(win(offs, x3))
        # o_ref = scratch[0] after the LAST rep = that window's first
        # y-row, i.e. x3[yoff, goff:goff+WG, :]
        yo = int(offs[2 * (REPS - 1)])
        go = int(offs[2 * (REPS - 1) + 1])
        want = np.asarray(x3)[yo, go:go + WG]
        ok = np.array_equal(got, want)
        print(f"strided window DMA: {'OK bit-exact' if ok else 'WRONG'}")
        if not ok:
            return
    except Exception as e:  # noqa: BLE001
        print(f"strided window DMA FAILED: {type(e).__name__}: {e}")
        return

    def bench(name, fn, *args):
        fn(*args).block_until_ready()
        best = 1e30
        for _ in range(5):
            t0 = time.perf_counter()
            float(jnp.sum(fn(*args)))
            best = min(best, time.perf_counter() - t0)
        byt = REPS * WY * WG * 128 * 4
        print(f"{name:28s}: {best * 1e3:7.3f} ms for {REPS} copies "
              f"({byt / best / 2 ** 30:6.1f} GiB/s, "
              f"{best / REPS * 1e6:6.1f} us/copy)")

    bench("strided (58, 7, 128) window", win, offs, x3)
    bench("contiguous same bytes", flat, offs_f, x2)

    # x-grouping shape (round 4): FEW LARGE segments -- a (GX, TY*G, 128)
    # window of the state viewed as (X, (Y+2)*G, 128). If this costs ~1
    # issue (not GX), grouping GX x-slabs per shadow tile divides the
    # shadow build's DMA issue count (its measured floor: ~20 ms at
    # 448^3 = 7168 copies x ~2.7 us) by GX.
    GX, SEG = 4, 1624            # 4 slabs x (TY=56: (56+2)*28 rows)
    XSL = RY * G // 12600        # view: (8, 12600, 128)
    x4 = x2.reshape(XSL, 12600, 128)
    offs_g = np.zeros(2 * REPS, np.int32)
    offs_g[0::2] = rng.randint(0, XSL - GX, REPS)
    offs_g[1::2] = rng.randint(0, 12600 - SEG, REPS)
    offs_g = jnp.asarray(offs_g)
    ggrp = pl.pallas_call(
        functools.partial(_win_kernel, R=XSL, WY=GX, WG=SEG, REPS=REPS),
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1, grid=(1,),
            in_specs=[pl.BlockSpec(memory_space=pl.ANY)],
            out_specs=pl.BlockSpec((SEG, 128), lambda i, s: (0, 0)),
            scratch_shapes=[pltpu.VMEM((GX, SEG, 128), jnp.float32),
                            pltpu.SemaphoreType.DMA]),
        out_shape=jax.ShapeDtypeStruct((SEG, 128), jnp.float32),
        interpret=interp,
    )
    offs_c = np.zeros(2 * REPS, np.int32)
    offs_c[0::2] = rng.randint(0, RY * G - GX * SEG, REPS)
    offs_c = jnp.asarray(offs_c)
    cgrp = pl.pallas_call(
        functools.partial(_flat_kernel, R=RY * G, WN=GX * SEG, REPS=REPS),
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1, grid=(1,),
            in_specs=[pl.BlockSpec(memory_space=pl.ANY)],
            out_specs=pl.BlockSpec((GX * SEG, 128), lambda i, s: (0, 0)),
            scratch_shapes=[pltpu.VMEM((GX * SEG, 128), jnp.float32),
                            pltpu.SemaphoreType.DMA]),
        out_shape=jax.ShapeDtypeStruct((GX * SEG, 128), jnp.float32),
        interpret=interp,
    )

    def bench2(name, fn, *args, byt=0):
        fn(*args).block_until_ready()
        best = 1e30
        for _ in range(5):
            t0 = time.perf_counter()
            float(jnp.sum(fn(*args)))
            best = min(best, time.perf_counter() - t0)
        print(f"{name:28s}: {best * 1e3:7.3f} ms for {REPS} copies "
              f"({byt / best / 2 ** 30:6.1f} GiB/s, "
              f"{best / REPS * 1e6:6.1f} us/copy)")

    byt_g = REPS * GX * SEG * 128 * 4
    bench2(f"strided ({GX}, {SEG}, 128) win", ggrp, offs_g, x4, byt=byt_g)
    bench2("contiguous same bytes (big)", cgrp, offs_c, x2, byt=byt_g)


if __name__ == "__main__":
    main()
