"""Compile + validate + time the slot shadow-build kernel on TPU at
bench shape, against the XLA build_shadow.

Run ON TPU: PYTHONPATH=/root/.axon_site:/root/repo python tools/probe_shadow_pallas.py [X Y Z]
"""

import functools
import sys
import time

import jax
import jax.numpy as jnp

from segfusion_tpu.ops import rowvol
from segfusion_tpu.ops.pallas.shadow_build import build_shadow_pallas

FRAMES = 8


def reachable_state(L, key):
    """Random slot-geo state with every physically-unreachable lane
    zeroed (pad rows, out-of-bounds corner comps) -- mirrors what real
    scatters can produce, so the two builders must agree bit-exactly."""
    g = jax.random.normal(key, (L.X, L.Y + 2, L.G, 8, 16),
                          jnp.float32) * 0.3
    g = g.at[:, 0].set(0.0).at[:, L.Y + 1].set(0.0)
    for c in (2, 3, 6, 7):
        g = g.at[:, L.Y, :, c].set(0.0)
    gz, sz = (L.Z - 1) // 16, (L.Z - 1) % 16
    for c in (1, 3, 5, 7):
        g = g.at[:, :, gz, c, sz].set(0.0)
    g = g.at[:, :, gz, :, sz + 1:].set(0.0)
    if gz + 1 < L.G:
        g = g.at[:, :, gz + 1:].set(0.0)
    return g.reshape(L.geo_rows, 128)


def main():
    shape = tuple(int(a) for a in sys.argv[1:4]) or (448, 448, 448)
    L = rowvol.RowLayout.for_shape(shape)
    # bit-equality vs XLA at a smaller shape (the XLA reconcile's
    # materialised planes exceed HBM at 448^3; it is the CPU-test path)
    Ls = rowvol.RowLayout.for_shape((224, 224, 224))
    geos = jax.jit(reachable_state, static_argnums=0)(
        Ls, jax.random.PRNGKey(1))
    s_x = jax.jit(rowvol.build_shadow, static_argnums=(1, 2))(
        geos, Ls, "xla")
    print("xla ok", flush=True)
    pal = jax.jit(build_shadow_pallas, static_argnums=(1, 2))
    s_p = pal(geos, Ls)
    print("pallas compiled", flush=True)
    eq = jax.jit(lambda a, b: jnp.all(a == b))(s_x, s_p)
    print("bit-equal @224^3:", bool(eq), flush=True)
    if not bool(eq):
        nd = int(jax.jit(lambda a, b: jnp.sum(a != b))(s_x, s_p))
        print(f"  differing lanes: {nd}", flush=True)
    del geos, s_x, s_p


    geo = jax.jit(reachable_state, static_argnums=0)(
        L, jax.random.PRNGKey(0))
    geo.block_until_ready()
    print(f"shape {shape}: geo rows={L.geo_rows} "
          f"({L.geo_rows*128*4/2**30:.2f} GiB), shadow rows="
          f"{L.shadow_rows} ({L.shadow_rows*128*4/2**30:.2f} GiB)",
          flush=True)

    iters = jnp.arange(FRAMES, dtype=jnp.float32)

    def loop(fn):
        def run(g):
            def body(c, i):
                s = fn(g + i * 0.0, L)
                return c + s[0, 0].astype(jnp.float32), None
            return jax.lax.scan(body, jnp.float32(0), iters)[0]
        return jax.jit(run)

    for name, fn in [
            ("pallas ty56", build_shadow_pallas),
            ("pallas ty28", functools.partial(build_shadow_pallas,
                                              max_ty=28)),
            ("pallas ty112", functools.partial(build_shadow_pallas,
                                               max_ty=112))]:
        r = loop(fn)
        float(r(geo))
        best = 1e30
        for _ in range(3):
            t0 = time.perf_counter()
            float(r(geo))
            best = min(best, time.perf_counter() - t0)
        print(f"build_shadow {name:12s} {best / FRAMES * 1e3:8.2f} "
              f"ms/frame", flush=True)


if __name__ == "__main__":
    main()
