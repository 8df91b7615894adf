"""On-TPU probes for the round-2 scatter/gather kernel design.

Measures (all scan-amortised inside one jit program, forced readback):
  1. XLA flat scalar gather ns/elem vs table size (does a VMEM-sized
     table beat the HBM-resident volume?)
  2. XLA flat scalar scatter-add ns/elem vs table size
  3. Pallas: scalar fori_loop gather from a VMEM table
  4. Pallas: jnp.take (vector gather) from a VMEM table  -- does Mosaic
     lower a dynamic gather, and at what rate?
  5. Pallas: scalar fori_loop read-modify-write add into a VMEM tile
  6. Pallas: dynamic-start static-size 3-D box DMA from an HBM volume
  7. one-hot matmul gather throughput for tiny tables (MXU route)

Run ON TPU (no env overrides): python tools/probe_random_access.py
"""

import functools
import time

import numpy as np

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

REPS = 20


def sync(x):
    # block_until_ready does not synchronise on the axon backend; a scalar
    # readback does (CLAUDE.md environment rules)
    return float(jnp.sum(x))


def timed(fn, *args, reps=3):
    fn_j = jax.jit(fn)
    sync(fn_j(*args))  # compile + warm
    best = 1e30
    for _ in range(reps):
        t0 = time.perf_counter()
        sync(fn_j(*args))
        best = min(best, time.perf_counter() - t0)
    return best


def probe_xla_gather():
    print("== 1. XLA flat scalar gather (ns/elem, REPS-amortised) ==",
          flush=True)
    n_idx = 1 << 20
    key = jax.random.PRNGKey(0)
    for side in (32, 64, 128, 256):
        nvox = side ** 3
        table = jnp.ones((nvox,), jnp.float32)
        idx = jax.random.randint(key, (n_idx,), 0, nvox, jnp.int32)

        def run(table, idx):
            def body(i, acc):
                # rotate indices to defeat caching of a fixed pattern
                g = jnp.take(table, (idx + i) % nvox, axis=0)
                return acc + jnp.sum(g)
            return jax.lax.fori_loop(0, REPS, body, 0.0)

        dt = timed(run, table, idx)
        print(f"  table {side}^3 ({nvox*4/2**20:.1f} MiB): "
              f"{dt/REPS/n_idx*1e9:.2f} ns/elem", flush=True)


def probe_xla_scatter():
    print("== 2. XLA flat scatter-add (ns/elem) ==", flush=True)
    n_idx = 1 << 20
    key = jax.random.PRNGKey(1)
    for side in (32, 64, 128, 256):
        nvox = side ** 3
        idx = jax.random.randint(key, (n_idx,), 0, nvox, jnp.int32)
        upd = jnp.ones((n_idx,), jnp.float32)
        vol = jnp.zeros((nvox,), jnp.float32)

        def run(vol, idx, upd):
            def body(i, v):
                return v.at[(idx + i) % nvox].add(upd)
            return jax.lax.fori_loop(0, REPS, body, vol)

        dt = timed(run, vol, idx, upd)
        print(f"  table {side}^3 ({nvox*4/2**20:.1f} MiB): "
              f"{dt/REPS/n_idx*1e9:.2f} ns/elem", flush=True)


def probe_pallas_scalar_gather():
    print("== 3. Pallas scalar-loop gather from VMEM ==", flush=True)
    nvox = 32 ** 3          # 128 KiB table
    n_idx = 1 << 16         # 64k gathers per kernel call

    def kernel(table_ref, idx_ref, out_ref):
        def body(i, _):
            out_ref[0, i] = table_ref[0, idx_ref[0, i]]
            return 0
        jax.lax.fori_loop(0, n_idx, body, 0)

    @jax.jit
    def run(table, idx):
        f = pl.pallas_call(
            kernel,
            out_shape=jax.ShapeDtypeStruct((1, n_idx), jnp.float32),
            in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM),
                      pl.BlockSpec(memory_space=pltpu.VMEM)],
            out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        )
        def body(i, acc):
            return acc + jnp.sum(f(table, (idx + i) % nvox))
        return jax.lax.fori_loop(0, 4, body, 0.0)

    table = jnp.ones((1, nvox), jnp.float32)
    idx = jax.random.randint(jax.random.PRNGKey(2), (1, n_idx), 0, nvox,
                             jnp.int32)
    try:
        dt = timed(run, table, idx)
        print(f"  scalar loop: {dt/4/n_idx*1e9:.2f} ns/elem", flush=True)
    except Exception as e:
        print(f"  FAILED: {type(e).__name__}: {str(e)[:300]}", flush=True)


def probe_pallas_vector_take():
    print("== 4. Pallas jnp.take vector gather from VMEM ==", flush=True)
    for nvox in (512, 32 ** 3, 64 ** 3):
        n_idx = 1 << 16

        def kernel(table_ref, idx_ref, out_ref):
            out_ref[:, :] = jnp.take(table_ref[0, :], idx_ref[:, :], axis=0)

        @jax.jit
        def run(table, idx):
            f = pl.pallas_call(
                kernel,
                out_shape=jax.ShapeDtypeStruct((n_idx // 128, 128),
                                               jnp.float32),
                in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM),
                          pl.BlockSpec(memory_space=pltpu.VMEM)],
                out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
            )
            def body(i, acc):
                return acc + jnp.sum(f(table, (idx + i) % nvox))
            return jax.lax.fori_loop(0, 4, body, 0.0)

        table = jnp.ones((1, nvox), jnp.float32)
        idx = jax.random.randint(jax.random.PRNGKey(3),
                                 (n_idx // 128, 128), 0, nvox, jnp.int32)
        try:
            dt = timed(run, table, idx)
            print(f"  table {nvox}: {dt/4/n_idx*1e9:.2f} ns/elem",
                  flush=True)
        except Exception as e:
            print(f"  table {nvox} FAILED: {type(e).__name__}: "
                  f"{str(e)[:300]}", flush=True)


def probe_pallas_scalar_rmw():
    print("== 5. Pallas scalar-loop RMW add into VMEM ==", flush=True)
    nvox = 32 ** 3
    n_idx = 1 << 16

    def kernel(idx_ref, upd_ref, out_ref):
        out_ref[:, :] = jnp.zeros_like(out_ref)

        def body(i, _):
            j = idx_ref[0, i]
            out_ref[0, j] = out_ref[0, j] + upd_ref[0, i]
            return 0
        jax.lax.fori_loop(0, n_idx, body, 0)

    @jax.jit
    def run(idx, upd):
        f = pl.pallas_call(
            kernel,
            out_shape=jax.ShapeDtypeStruct((1, nvox), jnp.float32),
            in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM),
                      pl.BlockSpec(memory_space=pltpu.VMEM)],
            out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        )
        def body(i, acc):
            return acc + jnp.sum(f((idx + i) % nvox, upd))
        return jax.lax.fori_loop(0, 4, body, 0.0)

    idx = jax.random.randint(jax.random.PRNGKey(4), (1, n_idx), 0, nvox,
                             jnp.int32)
    upd = jnp.ones((1, n_idx), jnp.float32)
    try:
        dt = timed(run, idx, upd)
        print(f"  scalar RMW: {dt/4/n_idx*1e9:.2f} ns/elem", flush=True)
    except Exception as e:
        print(f"  FAILED: {type(e).__name__}: {str(e)[:300]}", flush=True)


def probe_box_dma():
    print("== 6. dynamic-start 3-D box DMA HBM->VMEM ==", flush=True)
    side = 256
    box = 64
    vol = jnp.ones((side, side, side), jnp.float32)

    def kernel(pos_ref, vol_ref, out_ref):
        def inner(scratch, sem):
            x, y, z = pos_ref[0], pos_ref[1], pos_ref[2]
            dma = pltpu.make_async_copy(
                vol_ref.at[pl.ds(x, box), pl.ds(y, box), pl.ds(z, box)],
                scratch, sem)
            dma.start()
            dma.wait()
            out_ref[:, :] = jnp.sum(scratch[:, :, :], axis=0)
        pl.run_scoped(inner,
                      scratch=pltpu.VMEM((box, box, box), jnp.float32),
                      sem=pltpu.SemaphoreType.DMA(()))

    @jax.jit
    def run(vol, pos):
        f = pl.pallas_call(
            kernel,
            out_shape=jax.ShapeDtypeStruct((box, box), jnp.float32),
            in_specs=[pl.BlockSpec(memory_space=pltpu.SMEM),
                      pl.BlockSpec(memory_space=pl.ANY)],
            out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        )
        def body(i, acc):
            p = jnp.stack([(pos[0] + 8 * i) % (side - box),
                           pos[1], pos[2]])
            return acc + jnp.sum(f(vol, p))
        return jax.lax.fori_loop(0, 16, body, 0.0)

    pos = jnp.asarray([8, 16, 32], jnp.int32)
    try:
        dt = timed(run, vol, pos)
        bytes_moved = 16 * box ** 3 * 4
        print(f"  {box}^3 box: {dt/16*1e6:.0f} us/box, "
              f"{bytes_moved/dt/2**30:.1f} GiB/s", flush=True)
    except Exception as e:
        print(f"  FAILED: {type(e).__name__}: {str(e)[:300]}", flush=True)


def probe_onehot_matmul():
    print("== 7. one-hot matmul gather (MXU route) ==", flush=True)
    # gather 2048 values from a 512-entry table as (2048,512)@(512,128)
    E, V = 2048, 512

    def run(idx, table):
        def body(i, acc):
            oh = (idx[:, None] == jnp.arange(V)[None, :]).astype(
                jnp.bfloat16)
            g = jnp.dot(oh, table, preferred_element_type=jnp.float32)
            return acc + jnp.sum(g)
        return jax.lax.fori_loop(0, REPS, body, 0.0)

    idx = jax.random.randint(jax.random.PRNGKey(5), (E,), 0, V, jnp.int32)
    table = jnp.ones((V, 128), jnp.bfloat16)
    dt = timed(run, idx, table)
    print(f"  E={E} V={V}: {dt/REPS/E*1e9:.1f} ns/gather-row "
          f"({2*E*V*128*REPS/dt/1e12:.1f} Tflop/s)", flush=True)


if __name__ == "__main__":
    print("devices:", jax.devices(), flush=True)
    probe_xla_gather()
    probe_xla_scatter()
    probe_pallas_scalar_gather()
    probe_pallas_vector_take()
    probe_pallas_scalar_rmw()
    probe_box_dma()
    probe_onehot_matmul()
    print("done", flush=True)
