"""Measure effective HBM bandwidth on this TPU for dense ops: pure read
(sum), read+write (add-one, donated), and a relayout (transpose-ish).

Run ON TPU: PYTHONPATH=/root/.axon_site:/root/repo python tools/probe_hbm_bw.py
"""

import time

import jax
import jax.numpy as jnp

GB = 2**30


def timed(label, make_fn, gb_moved, reps=4):
    fn = make_fn()
    out = fn()
    jax.block_until_ready(out)
    float(jnp.sum(out[0].astype(jnp.float32))
          if isinstance(out, tuple) else jnp.sum(out.astype(jnp.float32)))
    best = 1e30
    for _ in range(reps):
        t0 = time.perf_counter()
        out = fn()
        s = float(jnp.sum(out[0].astype(jnp.float32))
                  if isinstance(out, tuple)
                  else jnp.sum(out.astype(jnp.float32)))
        best = min(best, time.perf_counter() - t0)
    print(f"{label:34s} {best*1e3:8.2f} ms  -> {gb_moved/best:7.1f} GB/s",
          flush=True)


def main():
    n = 640 * 2**20 // 4   # 2.5 GiB of f32
    a = jax.jit(lambda: jnp.ones((n,), jnp.float32))()
    a.block_until_ready()
    gb = n * 4 / GB

    # read-only: sum reduction (fused tree-reduce, ~1 read pass)
    f_sum = jax.jit(lambda x: jnp.sum(x))
    timed("sum 2.5 GiB (read)", lambda: (lambda: f_sum(a)), gb)

    # read+write elementwise, 8-frame scan to amortise dispatch
    iters = jnp.arange(8, dtype=jnp.float32)

    def loop(x):
        def body(c, i):
            return c * 1.0000001 + i * 1e-9, None
        return jax.lax.scan(body, x, iters)[0]

    f_loop = jax.jit(loop, donate_argnums=0)
    b = jax.jit(lambda: jnp.ones((n,), jnp.float32))()
    b.block_until_ready()
    t0 = time.perf_counter()
    b = f_loop(b)
    float(jnp.sum(b[:8]))
    warm = time.perf_counter() - t0
    t0 = time.perf_counter()
    b = f_loop(b)
    float(jnp.sum(b[:8]))
    dt = time.perf_counter() - t0
    per = dt / 8
    print(f"{'add-one x8 scan (r+w)':34s} {per*1e3:8.2f} ms/iter -> "
          f"{2*gb/per:7.1f} GB/s", flush=True)

    # u32 pack of two halves (the shadow's minimal output op)
    m = n // 2
    f_pack = jax.jit(lambda x: jax.lax.bitcast_convert_type(
        x[:m] + x[m:2*m], jnp.uint32))
    timed("pack-ish (2 reads 1 write)",
          lambda: (lambda: f_pack(a)), 1.5 * gb)


if __name__ == "__main__":
    main()
