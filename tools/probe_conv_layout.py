"""Small-channel conv stacks: NHWC (channels in lanes, heavily padded at
C~6) vs NCHW (spatial in lanes) on this TPU, at FusionNet-like shapes.

Run ON TPU: PYTHONPATH=/root/.axon_site:/root/repo python tools/probe_conv_layout.py
"""

import time

import numpy as np
import jax
import jax.numpy as jnp

H = W = 256
C = 6
LAYERS = 20
FRAMES = 8


def timed(label, fn, *args):
    f = jax.jit(fn)
    out = f(*args)
    float(jnp.sum(out.astype(jnp.float32)))
    best = 1e30
    for _ in range(3):
        t0 = time.perf_counter()
        out = f(*args)
        float(jnp.sum(out.astype(jnp.float32)))
        best = min(best, time.perf_counter() - t0)
    per = best / FRAMES / LAYERS * 1e6
    print(f"{label:40s} {best / FRAMES * 1e3:8.2f} ms/frame "
          f"({per:6.1f} us/conv)", flush=True)


def main():
    rng = np.random.RandomState(0)
    ws = jnp.asarray(rng.randn(LAYERS, 3, 3, C, C).astype(np.float32)
                     * 0.1)
    x0 = jnp.asarray(rng.randn(1, H, W, C).astype(np.float32))
    iters = jnp.arange(FRAMES, dtype=jnp.float32)

    def stack_nhwc(x, w, dtype):
        x = x.astype(dtype)
        for i in range(LAYERS):
            x = jax.lax.conv_general_dilated(
                x, w[i].astype(dtype), (1, 1), "SAME",
                dimension_numbers=("NHWC", "HWIO", "NHWC"))
            x = jax.nn.leaky_relu(x)
        return x

    def stack_nchw(x, w, dtype):
        x = x.transpose(0, 3, 1, 2).astype(dtype)
        for i in range(LAYERS):
            wi = w[i].transpose(3, 2, 0, 1).astype(dtype)   # OIHW
            x = jax.lax.conv_general_dilated(
                x, wi, (1, 1), "SAME",
                dimension_numbers=("NCHW", "OIHW", "NCHW"))
            x = jax.nn.leaky_relu(x)
        return x.transpose(0, 2, 3, 1)

    def conv_shifted(x, w, dtype):
        """3x3 SAME conv as 9-slice concat (of one spatially padded
        tensor) + one dot: lanes go from C to 9C."""
        B, Hh, Ww, Ci = x.shape
        xp = jnp.pad(x, ((0, 0), (1, 1), (1, 1), (0, 0)))
        cols = [xp[:, 1 + dy:1 + dy + Hh, 1 + dx:1 + dx + Ww]
                for dy in (-1, 0, 1) for dx in (-1, 0, 1)]
        patches = jnp.concatenate(cols, axis=-1)        # (B, H, W, 9C)
        wm = w.reshape(9 * Ci, -1)
        return jnp.einsum("bhwk,ko->bhwo", patches,
                          wm.astype(dtype))

    def stack_shift(x, w, dtype):
        x = x.astype(dtype)
        for i in range(LAYERS):
            x = conv_shifted(x, w[i], dtype)
            x = jax.nn.leaky_relu(x)
        return x

    for name, f, dt in [
            ("shifted-matmul bf16", stack_shift, jnp.bfloat16),
            ("NHWC bf16", stack_nhwc, jnp.bfloat16),
            ("NCHW bf16", stack_nchw, jnp.bfloat16),
            ("NHWC f32", stack_nhwc, jnp.float32),
            ("NCHW f32", stack_nchw, jnp.float32)]:
        def loop(x, w, f=f, dt=dt):
            def body(c, i):
                y = f(x + i * 1e-6, w, dt)
                return c + y[0, 0, 0, 0].astype(jnp.float32), None
            return jax.lax.scan(body, jnp.float32(0), iters)[0][None]
        timed(name, loop, x0, ws)

    # numerics: NCHW must equal NHWC (same weights, same math)
    a = jax.jit(lambda x, w: stack_nhwc(x, w, jnp.float32))(x0, ws)
    b = jax.jit(lambda x, w: stack_nchw(x, w, jnp.float32))(x0, ws)
    c = jax.jit(lambda x, w: stack_shift(x, w, jnp.float32))(x0, ws)
    print(f"max |NHWC - NCHW| (f32): "
          f"{float(jnp.max(jnp.abs(a - b))):.2e}", flush=True)
    print(f"max |NHWC - shifted| (f32): "
          f"{float(jnp.max(jnp.abs(a - c))):.2e}", flush=True)


if __name__ == "__main__":
    main()
