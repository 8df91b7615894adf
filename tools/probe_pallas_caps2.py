"""Second Mosaic capability probe for the slot-shadow kernel:
- ref stores at static 16/32-lane offsets
- 16-lane slices at offset 0 after roll-normalisation
- rolls by 1 / 15 / 16 on 128 lanes
- major-axis strided regroup (TY, G, 16) -> (TY, GK, 2, 16)[:, :, i]
- dynamic-offset DMA from HBM (ANY) into VMEM scratch

Run ON TPU: python tools/probe_pallas_caps2.py
"""

import numpy as np
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def tryk(name, kernel, x, out_shape, **kw):
    try:
        y = pl.pallas_call(kernel, out_shape=out_shape, **kw)(x)
        y.block_until_ready()
        print(f"OK    {name}: {np.asarray(y).reshape(-1)[:4]}")
        return True
    except Exception as e:
        msg = str(e).split("\n")[0][:120]
        print(f"FAIL  {name}: {type(e).__name__}: {msg}")
        return False


def main():
    x = jnp.arange(16 * 128, dtype=jnp.float32).reshape(16, 128)
    f = jax.ShapeDtypeStruct((16, 128), jnp.float32)

    def k_store16(x_ref, o_ref):
        v = x_ref[...]
        o_ref[:, 0:16] = v[:, 0:16] * 2.0
        o_ref[:, 16:32] = v[:, 0:16] * 3.0
        o_ref[:, 32:128] = v[:, 32:128]

    tryk("ref store at 16-lane offsets", k_store16, x, f)

    def k_rolls(x_ref, o_ref):
        v = x_ref[...]
        a = pltpu.roll(v, 1, 1)
        b = pltpu.roll(v, 15, 1)
        c = pltpu.roll(v, 16, 1)
        d = pltpu.roll(v, 48, 1)
        o_ref[...] = a + b + c + d

    tryk("rolls by 1/15/16/48", k_rolls, x, f)

    def k_narrow(x_ref, o_ref):
        v = x_ref[...]
        n = v[:, 0:16]                       # (16, 16) narrow
        m = pltpu.roll(v, 16, 1)[:, 0:16]
        o_ref[...] = jnp.pad(n + m, ((0, 0), (0, 112)))

    tryk("16-lane narrow slice + pad back", k_narrow, x, f)

    x3 = jnp.arange(8 * 28 * 16, dtype=jnp.float32).reshape(8, 28, 16)
    f3 = jax.ShapeDtypeStruct((8, 14, 16), jnp.float32)

    def k_regroup(x_ref, o_ref):
        v = x_ref[...]                       # (8, 28, 16)
        r = v.reshape(8, 14, 2, 16)
        o_ref[...] = r[:, :, 0] + r[:, :, 1] * 2.0

    tryk("major regroup (G) -> (GK, 2) + index", k_regroup, x3, f3)

    # dynamic-offset DMA: copy rows [k*8, k*8+8) from an ANY input
    big = jnp.arange(64 * 128, dtype=jnp.float32).reshape(64, 128)

    def k_dma(x_hbm, o_ref, scratch, sem):
        k = pl.program_id(0)
        cp = pltpu.make_async_copy(
            x_hbm.at[pl.ds(k * 8, 8), :], scratch, sem)
        cp.start()
        cp.wait()
        o_ref[...] = scratch[...] + 1.0

    try:
        y = pl.pallas_call(
            k_dma,
            grid=(4,),
            in_specs=[pl.BlockSpec(memory_space=pltpu.ANY)],
            out_specs=pl.BlockSpec((8, 128), lambda k: (k, 0)),
            out_shape=jax.ShapeDtypeStruct((32, 128), jnp.float32),
            scratch_shapes=[pltpu.VMEM((8, 128), jnp.float32),
                            pltpu.SemaphoreType.DMA(())],
        )(big)
        y.block_until_ready()
        print(f"OK    dynamic-offset DMA: {np.asarray(y)[0, :3]}")
    except Exception as e:
        print(f"FAIL  dynamic-offset DMA: {type(e).__name__}: "
              f"{str(e).splitlines()[0][:120]}")


if __name__ == "__main__":
    main()
