"""Does JAX's persistent compilation cache work through the axon relay?

If it does, `python bench.py` in the driver window can skip the
multi-minute per-mode compiles whenever this session already ran the
same programs -- turning the round-exit BENCH from compile-bound
(~5-13 min/mode, the round-4 rc=124 killer) into run-bound (~seconds).

Run twice ON TPU:  python tools/probe_compile_cache.py
First run should report a slow compile + cache write; the second a fast
cache hit. The verdict line says HIT/MISS based on wall time.
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))

CACHE_DIR = os.path.join(os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))), ".jax_cache")


def main():
    import jax
    import jax.numpy as jnp

    jax.config.update("jax_compilation_cache_dir", CACHE_DIR)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)
    jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)

    # a distinctive program big enough to take >1s to compile
    def f(x, w):
        def body(c, _):
            c = jnp.tanh(c @ w) + jnp.roll(c, 1, axis=0) * 0.5
            return c, jnp.sum(c)
        c, s = jax.lax.scan(body, x, None, length=32)
        return c, s

    x = jnp.ones((512, 512), jnp.bfloat16)
    w = jnp.ones((512, 512), jnp.bfloat16)
    t0 = time.perf_counter()
    c, s = jax.jit(f)(x, w)
    float(jnp.sum(s))
    dt = time.perf_counter() - t0
    n_entries = len(os.listdir(CACHE_DIR)) if os.path.isdir(CACHE_DIR) \
        else 0
    print(f"first-call wall (compile+run): {dt:.2f}s; "
          f"cache entries now: {n_entries}", flush=True)
    print("verdict:", "HIT (cache works through the relay)" if dt < 5.0
          else "MISS/slow (compiled from scratch)", flush=True)


if __name__ == "__main__":
    main()
