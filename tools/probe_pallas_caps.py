"""Probe Mosaic lowering support on this environment's TPU for the ops
the Pallas shadow-build kernel needs: f16 convert + bitcast to u16/u32,
64-lane static slices and lane concats, pltpu.roll, u32 shifts/or, and
major-dim reshapes of loaded values.

Run ON TPU: python tools/probe_pallas_caps.py
"""

import sys
import traceback

import numpy as np
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def tryk(name, kernel, x, out_shape):
    try:
        y = pl.pallas_call(kernel, out_shape=out_shape)(x)
        y.block_until_ready()
        print(f"OK    {name}: {np.asarray(y).reshape(-1)[:4]}")
        return True
    except Exception as e:
        msg = str(e).split("\n")[0][:140]
        print(f"FAIL  {name}: {type(e).__name__}: {msg}")
        return False


def main():
    x = jnp.arange(8 * 128, dtype=jnp.float32).reshape(8, 128) * 0.01
    u32 = jax.ShapeDtypeStruct((8, 128), jnp.uint32)
    f32 = jax.ShapeDtypeStruct((8, 128), jnp.float32)

    def k_f16pack(x_ref, o_ref):
        v = x_ref[...]
        h = v.astype(jnp.float16)
        b = jax.lax.bitcast_convert_type(h, jnp.uint16).astype(jnp.uint32)
        o_ref[...] = (b << 16) | b

    tryk("f16 convert + bitcast u16 + u32 shift/or", k_f16pack, x, u32)

    def k_slice64(x_ref, o_ref):
        v = x_ref[...]
        lo, hi = v[:, :64], v[:, 64:]
        o_ref[...] = jnp.concatenate([hi, lo], axis=-1)

    tryk("64-lane slice + lane concat", k_slice64, x, f32)

    def k_roll(x_ref, o_ref):
        o_ref[...] = pltpu.roll(x_ref[...], 64, 1)

    tryk("pltpu.roll by 64 lanes", k_roll, x, f32)

    x3 = jnp.arange(32 * 512, dtype=jnp.float32).reshape(32, 512)
    f3 = jax.ShapeDtypeStruct((32, 512), jnp.float32)

    def k_reshape(x_ref, o_ref):
        v = x_ref[...].reshape(8, 4, 512)
        w = v[:, 0, 0:128] + v[:, 1, 128:256] + v[:, 3, 384:512]
        o_ref[...] = jnp.concatenate(
            [jnp.broadcast_to(w[:, None, :], (8, 4, 128)).reshape(32, 128)]
            * 4, axis=-1)

    tryk("major reshape + 128-lane comp slices", k_reshape, x3, f3)

    def k_padq(x_ref, o_ref):
        v = x_ref[...].reshape(8, 4, 512)
        shifted = jnp.concatenate(
            [jnp.zeros((1, 4, 512), jnp.float32), v], axis=0)[:8]
        o_ref[...] = shifted.reshape(32, 512)

    tryk("major-axis concat (qshift)", k_padq, x3, f3)

    def k_iota_mask(x_ref, o_ref):
        v = x_ref[...].reshape(8, 4, 512)
        q = jax.lax.broadcasted_iota(jnp.int32, (8, 4, 512), 0)
        o_ref[...] = jnp.where(q == 0, 0.0, v).reshape(32, 512)

    tryk("3-D broadcasted_iota + where", k_iota_mask, x3, f3)

    # f16 -> f32 unpack direction (extract side, for completeness)
    def k_unpack(x_ref, o_ref):
        v = x_ref[...]
        b = jax.lax.bitcast_convert_type(v, jnp.uint32)
        h = jax.lax.bitcast_convert_type(
            (b >> 16).astype(jnp.uint16), jnp.float16)
        o_ref[...] = h.astype(jnp.float32)

    tryk("u32 -> f16 bitcast -> f32", k_unpack, x, f32)


if __name__ == "__main__":
    main()
