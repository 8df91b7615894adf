"""Compile + validate + time the Pallas shadow-build kernel on TPU at
bench shape, against the XLA build_shadow.

Run ON TPU: python tools/probe_shadow_pallas.py [X Y Z]
"""

import sys
import time

import numpy as np
import jax
import jax.numpy as jnp

from segfusion_tpu.ops import rowvol
from segfusion_tpu.ops.pallas.shadow_build import build_shadow_pallas

FRAMES = 8


def main():
    shape = tuple(int(a) for a in sys.argv[1:4]) or (448, 448, 448)
    L = rowvol.RowLayout.for_shape(shape)
    rng = np.random.RandomState(0)
    # build on device to avoid a 2.7 GB host transfer
    keys = jax.random.split(jax.random.PRNGKey(0), 1)
    geo = jax.jit(lambda k: jax.random.normal(
        k, (L.rows, 512), jnp.float32) * 0.3)(keys[0])
    geo.block_until_ready()
    print(f"shape {shape}: rows={L.rows} geo={L.rows*512*4/2**30:.2f} GiB",
          flush=True)

    xla = jax.jit(rowvol.build_shadow, static_argnums=1)
    pal = jax.jit(build_shadow_pallas, static_argnums=(1, 2))

    s_x = xla(geo, L)
    print("xla ok", flush=True)
    s_p = pal(geo, L)
    print("pallas compiled", flush=True)
    eq = jax.jit(lambda a, b: jnp.all(a == b))(s_x, s_p)
    print("bit-equal:", bool(eq), flush=True)
    if not bool(eq):
        ndiff = int(jax.jit(lambda a, b: jnp.sum(a != b))(s_x, s_p))
        print(f"  differing lanes: {ndiff}", flush=True)

    iters = jnp.arange(FRAMES, dtype=jnp.float32)

    def loop(fn):
        def run(g):
            def body(c, i):
                s = fn(g + i * 0.0, L)
                return c + s[0, 0].astype(jnp.float32), None
            return jax.lax.scan(body, jnp.float32(0), iters)[0]
        return jax.jit(run)

    import functools
    for name, fn in [
            ("xla", functools.partial(rowvol.build_shadow, impl="xla")),
            ("pallas tq32", build_shadow_pallas),
            ("pallas tq16", functools.partial(build_shadow_pallas,
                                              max_tq=16)),
            ("pallas tq56", functools.partial(build_shadow_pallas,
                                              max_tq=56))]:
        r = loop(fn)
        float(r(geo))
        best = 1e30
        for _ in range(3):
            t0 = time.perf_counter()
            float(r(geo))
            best = min(best, time.perf_counter() - t0)
        print(f"build_shadow {name:8s} {best / FRAMES * 1e3:8.2f} ms/frame",
              flush=True)


if __name__ == "__main__":
    main()
