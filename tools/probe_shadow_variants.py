"""Dissect the Pallas shadow-build kernel's cost at the bench shape
(448^3): dependency-chained loops (iterations cannot overlap) over
(1) the full kernel, (2) a DMA-only copy kernel with the same halo-DMA
pattern + output shape, (3) DMA + reconcile but no pack/assembly,
(4) the kernel with a bigger/smaller y-tile.

The in-context cost is ~40 ms vs a ~20 ms HBM-BW floor (PERFORMANCE.md);
this tells us whether the gap is DMA scheduling, compute, or output
pipelining.

Run ON TPU: python tools/probe_shadow_variants.py
"""

import functools
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)),
                                ".."))

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from segfusion_tpu.ops.rowvol import RowLayout
from segfusion_tpu.ops.pallas import shadow_build as sb


def chain_time(label, fn, geo, iters=8):
    """Time fn(geo) -> shadow with a dependency chain: geo is perturbed by
    a cheap function of the output each iteration so XLA cannot overlap
    or elide iterations."""
    @jax.jit
    def loop(geo):
        acc = jnp.uint32(0)
        for _ in range(iters):
            out = fn(geo)
            # cheap dependency: one lane of the output folds into geo
            acc = acc ^ out[0, 0]
            geo = geo + (acc % 2).astype(jnp.float32) * 1e-30
        return geo, acc

    g, a = loop(geo)
    float(jnp.sum(g[:4]))
    t0 = time.perf_counter()
    g, a = loop(geo)
    float(jnp.sum(g[:4]) + a.astype(jnp.float32))
    dt = (time.perf_counter() - t0) / iters
    print(f"{label:44s} {dt*1e3:8.2f} ms/call", flush=True)
    return dt


def dma_only_kernel(geo_hbm, out_ref, slab, sem, *, TY, Y, G, GK, NJ, N):
    """Same grid/halo-DMA/output shape as the shadow kernel, near-zero
    compute: measures the achievable BW of the pipeline structure."""
    x = pl.program_id(0)
    j = pl.program_id(1)
    i = x * NJ + j
    SLAB = (TY + 2) * G

    def dma(idx, s):
        xx = idx // NJ
        jj = idx - xx * NJ
        start = (xx * (Y + 2) + jj * TY) * G
        return pltpu.make_async_copy(
            geo_hbm.at[pl.ds(start, SLAB), :], slab.at[s], sem.at[s])

    @pl.when(i == 0)
    def _():
        dma(0, 0).start()

    @pl.when(i + 1 < N)
    def _():
        dma(i + 1, (i + 1) % 2).start()

    dma(i, i % 2).wait()
    v = slab[i % 2].reshape(TY + 2, G, 128)
    # minimal compute: bitcast + slice into the output rows
    u = jax.lax.bitcast_convert_type(v[1:TY + 1], jnp.uint32)
    Gp = 2 * GK
    if G < Gp:
        u = jnp.concatenate(
            [u, jnp.zeros((TY, Gp - G, 128), jnp.uint32)], axis=1)
    out_ref[0] = u.reshape(TY * GK, 256)[:, :128]


def dma_only(geo, layout, max_ty=56):
    L = layout
    X, Y, G, GK = L.X, L.Y, L.G, L.GK
    TY = sb._pick_ty(Y, max_ty)
    NJ = Y // TY
    out = pl.pallas_call(
        functools.partial(dma_only_kernel, TY=TY, Y=Y, G=G, GK=GK, NJ=NJ,
                          N=X * NJ),
        grid=(X, NJ),
        in_specs=[pl.BlockSpec(memory_space=pl.ANY)],
        out_specs=pl.BlockSpec((1, TY * GK, 128), lambda x, j: (x, j, 0)),
        out_shape=jax.ShapeDtypeStruct((X, Y * GK, 128), jnp.uint32),
        scratch_shapes=[pltpu.VMEM((2, (TY + 2) * G, 128), jnp.float32),
                        pltpu.SemaphoreType.DMA((2,))],
    )(geo)
    return out.reshape(L.shadow_rows, 128)


def main():
    L = RowLayout.for_shape((448, 448, 448))
    print(f"layout: geo_rows={L.geo_rows} ({L.geo_rows*128*4/2**30:.2f} GB)"
          f" shadow_rows={L.shadow_rows} "
          f"({L.shadow_rows*128*4/2**30:.2f} GB)", flush=True)
    key = jax.random.PRNGKey(0)
    geo = jax.random.uniform(key, (L.geo_rows, 128), jnp.float32)

    bw_floor = (L.geo_rows + L.shadow_rows) * 128 * 4 / 213e9
    print(f"BW floor @213GB/s: {bw_floor*1e3:.1f} ms", flush=True)

    chain_time("full shadow kernel (TY=56)",
               lambda g: sb.build_shadow_pallas(g, L), geo)
    chain_time("DMA-only same structure (TY=56)",
               lambda g: dma_only(g, L), geo)
    for ty in (16, 28, 112, 224):
        try:
            chain_time(f"full shadow kernel (TY={ty})",
                       lambda g, t=ty: sb.build_shadow_pallas(g, L,
                                                              max_ty=t),
                       geo)
        except Exception as e:
            print(f"  TY={ty} failed: {type(e).__name__}: {e}",
                  flush=True)


if __name__ == "__main__":
    main()
