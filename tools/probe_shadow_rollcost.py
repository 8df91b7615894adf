"""Isolate what the shadow kernel's time goes to by stubbing op classes:
- baseline (full kernel)
- rolls stubbed to identity (wrong results, timing only)
- zmerge skipped entirely (d = direct comps)
- masks skipped (no qg iota multiplies)

Run ON TPU: PYTHONPATH=/root/.axon_site:/root/repo python tools/probe_shadow_rollcost.py
"""

import time

import jax
import jax.numpy as jnp
from jax.experimental.pallas import tpu as pltpu

from segfusion_tpu.ops import rowvol
from segfusion_tpu.ops.pallas import shadow_build as sb

SHAPE = (448, 448, 448)
FRAMES = 8


def timed(label, geo, L):
    fn = jax.jit(sb.build_shadow_pallas, static_argnums=(1, 2, 3))
    iters = jnp.arange(FRAMES, dtype=jnp.float32)

    def loop(g):
        def body(c, i):
            s = sb.build_shadow_pallas(g + i * 0.0, L)
            return c + s[0, 0].astype(jnp.float32), None
        return jax.lax.scan(body, jnp.float32(0), iters)[0]

    r = jax.jit(loop)
    float(r(geo))
    best = 1e30
    for _ in range(3):
        t0 = time.perf_counter()
        float(r(geo))
        best = min(best, time.perf_counter() - t0)
    print(f"{label:36s} {best / FRAMES * 1e3:8.2f} ms/frame", flush=True)


def main():
    L = rowvol.RowLayout.for_shape(SHAPE)
    geo = jax.jit(lambda: jnp.zeros((L.rows, 512), jnp.float32))()
    geo.block_until_ready()

    timed("baseline", geo, L)

    real_roll = pltpu.roll
    pltpu.roll = lambda x, s, a: x
    try:
        timed("rolls stubbed", geo, L)
    finally:
        pltpu.roll = real_roll

    real_zmerge = sb._zmerge
    sb._zmerge = lambda s0, s1, TQ, ZB0, ZB1: [
        c0[:, :ZB0] if c0.shape[1] >= ZB0 else jnp.concatenate(
            [c0, jnp.zeros((TQ, ZB0 - c0.shape[1], 128), c0.dtype)],
            axis=1)
        for c0 in s0]
    try:
        timed("zmerge skipped", geo, L)
    finally:
        sb._zmerge = real_zmerge

    real_blocks = sb._blocks64
    sb._blocks64 = lambda p, TQ, ZB0: jnp.concatenate(
        [p, p], axis=1)  # (TQ, 2*ZB0, 128) without interleave/rolls
    try:
        timed("blocks64 stubbed", geo, L)
    finally:
        sb._blocks64 = real_blocks

    real_pack = sb._pack16
    sb._pack16 = lambda n, w: jax.lax.bitcast_convert_type(
        n + w, jnp.uint32)
    try:
        timed("pack stubbed", geo, L)
    finally:
        sb._pack16 = real_pack


if __name__ == "__main__":
    main()
