"""Probe tpu.dynamic_gather via pallas jnp.take_along_axis.

Mosaic lowers lax.gather to tpu.dynamic_gather ONLY for 2D same-shape
take_along_axis (operand (S,128), idx (S,128), out (S,128); per-lane
lookup along sublanes for axis=0). Questions:
  * does it compile for large S (table rows)?
  * correctness (per-lane table semantics)
  * ns per gathered element vs S
Run ON TPU: python tools/probe_dynamic_gather.py
"""

import time

import numpy as np
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def sync(x):
    return float(jnp.sum(x))


def probe(S, dtype=jnp.float32, axis=0, reps=8, inner=8):
    def kernel(table_ref, idx_ref, out_ref):
        t = table_ref[:, :]
        o = jnp.zeros_like(t)
        for k in range(inner):
            idx = (idx_ref[:, :] + k) % S
            o = o + jnp.take_along_axis(t, idx, axis=axis,
                                        mode="promise_in_bounds")
        out_ref[:, :] = o

    @jax.jit
    def run(table, idx):
        return pl.pallas_call(
            kernel,
            out_shape=jax.ShapeDtypeStruct((S, 128), dtype),
            in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM),
                      pl.BlockSpec(memory_space=pltpu.VMEM)],
            out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        )(table, idx)

    # per-lane table: lane j holds table column j; replicate one table
    # across lanes for shared-table semantics
    tab1 = np.arange(S, dtype=np.float32) * 0.5
    table = jnp.asarray(np.broadcast_to(tab1[:, None], (S, 128)).copy(),
                        dtype)
    idx = jax.random.randint(jax.random.PRNGKey(0), (S, 128), 0, S,
                             jnp.int32)
    try:
        out = run(table, idx)
        # correctness vs numpy (k=0 term only: recompute full sum)
        want = np.zeros((S, 128), np.float32)
        idx_np = np.asarray(idx)
        for k in range(inner):
            want += tab1[(idx_np + k) % S]
        np.testing.assert_allclose(np.asarray(out, np.float32), want,
                                   rtol=1e-6)
        sync(out)
        best = 1e30
        for _ in range(reps):
            t0 = time.perf_counter()
            sync(run(table, idx))
            best = min(best, time.perf_counter() - t0)
        n = S * 128 * inner
        print(f"  S={S:6d} axis={axis} {np.dtype(dtype.dtype if hasattr(dtype,'dtype') else dtype).name}: "
              f"{best/n*1e9:.3f} ns/elem ({n/best/1e9:.2f} G/s)",
              flush=True)
        return best / n
    except Exception as e:
        print(f"  S={S} axis={axis}: FAILED {type(e).__name__}: "
              f"{str(e)[:200]}", flush=True)
        return None


if __name__ == "__main__":
    print("devices:", jax.devices(), flush=True)
    print("== dynamic_gather axis=0 (per-lane sublane lookup) ==",
          flush=True)
    for S in (8, 64, 512, 4096, 8192, 32768):
        probe(S, jnp.float32, axis=0)
    print("== axis=0, uint32 ==", flush=True)
    probe(8192, jnp.uint32, axis=0)
    print("== axis=1 (per-sublane lane lookup) ==", flush=True)
    for S in (512,):
        # axis=1 wants operand (8?, S)? keep same-square probe shape
        pass
    # axis=1 probe with (128, 128)
    def probe_axis1():
        S = 128

        def kernel(table_ref, idx_ref, out_ref):
            out_ref[:, :] = jnp.take_along_axis(
                table_ref[:, :], idx_ref[:, :], axis=1,
                mode="promise_in_bounds")

        @jax.jit
        def run(table, idx):
            return pl.pallas_call(
                kernel,
                out_shape=jax.ShapeDtypeStruct((S, 128), jnp.float32),
                in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM),
                          pl.BlockSpec(memory_space=pltpu.VMEM)],
                out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
            )(table, idx)

        tab = np.random.RandomState(0).rand(S, 128).astype(np.float32)
        idx = np.random.RandomState(1).randint(0, 128, (S, 128))
        try:
            out = run(jnp.asarray(tab), jnp.asarray(idx, jnp.int32))
            want = np.take_along_axis(tab, idx, axis=1)
            np.testing.assert_allclose(np.asarray(out), want, rtol=1e-6)
            print("  axis=1 (128,128): works", flush=True)
        except Exception as e:
            print(f"  axis=1 FAILED: {type(e).__name__}: {str(e)[:200]}",
                  flush=True)
    probe_axis1()
    print("done", flush=True)
