"""Clean cost separation for the shadow kernel at 448^3:

1. pure elementwise pass over the geo state (donated, in-place) -- the
   real dense HBM r+w bandwidth, independent of the relay number.
2. kernel chained via a CHEAP dependency (single-row in-place update),
   so per-iter ~= kernel cost alone.
3. DMA-only kernel with the same cheap chain.

Run ON TPU: python tools/probe_shadow_v3.py
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
import importlib
spec = importlib.util.spec_from_file_location(
    "psv", os.path.join(os.path.dirname(os.path.abspath(__file__)),
                        "probe_shadow_variants.py"))
psv = importlib.util.module_from_spec(spec)
spec.loader.exec_module(psv)


def timed_loop(label, loop, geo, iters):
    out = loop(geo)
    float(jnp.sum(out[0][:2]))
    t0 = time.perf_counter()
    out = loop(geo)
    float(jnp.sum(out[0][:2]))
    dt = (time.perf_counter() - t0) / iters
    print(f"{label:46s} {dt*1e3:8.2f} ms/iter", flush=True)


def main():
    L = rowvol.RowLayout.for_shape((448, 448, 448))
    geo = jax.random.uniform(jax.random.PRNGKey(0), (L.geo_rows, 128),
                             jnp.float32)
    gbytes = L.geo_rows * 128 * 4 / 2**30
    iters = 8

    # 1. pure elementwise r+w pass (donated)
    @jax.jit
    def ew_loop(geo):
        for _ in range(iters):
            geo = geo * jnp.float32(1.0000001)
        return (geo,)

    t0 = time.perf_counter()
    out = ew_loop(geo)  # compile
    float(jnp.sum(out[0][:2]))
    t0 = time.perf_counter()
    out = ew_loop(geo)
    float(jnp.sum(out[0][:2]))
    dt = (time.perf_counter() - t0) / iters
    print(f"elementwise r+w pass over {gbytes:.2f} GiB: {dt*1e3:.2f} ms "
          f"-> {2*gbytes/dt:.0f} GiB/s", flush=True)

    # 2/3. kernels chained via single-row update
    def chain(fn):
        @jax.jit
        def loop(geo):
            for _ in range(iters):
                out = fn(geo)
                geo = geo.at[0, 0].add(
                    (out[0, 0] % 2).astype(jnp.float32) * 1e-30)
            return (geo,)
        return loop

    for ty in (28, 56):
        timed_loop(f"v2 shadow kernel TY={ty} (cheap chain)",
                   chain(lambda g, t=ty: sb.build_shadow_pallas(
                       g, L, max_ty=t)), geo, iters)
    timed_loop("DMA-only kernel (cheap chain)",
               chain(lambda g: psv.dma_only(g, L)), geo, iters)


if __name__ == "__main__":
    main()
