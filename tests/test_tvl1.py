"""TV-L1 TSDF refinement: denoises while preserving the zero level set."""

import numpy as np
import jax.numpy as jnp

from segfusion_tpu.ops.tvl1 import tvl1_refine


def test_tvl1_denoises():
    rng = np.random.RandomState(0)
    x, y, z = np.mgrid[:24, :24, :24].astype(np.float32)
    clean = (np.sqrt((x - 12) ** 2 + (y - 12) ** 2 + (z - 12) ** 2)
             - 8.0) / 8.0
    noisy = clean + rng.randn(24, 24, 24).astype(np.float32) * 0.1
    w = np.ones_like(clean)
    out = np.asarray(tvl1_refine(jnp.asarray(noisy), jnp.asarray(w),
                                 lam=1.0, n_iters=120))
    err_before = np.abs(noisy - clean).mean()
    err_after = np.abs(out - clean).mean()
    assert err_after < 0.6 * err_before, (err_before, err_after)
    # zero level set preserved: sign agreement with clean stays high
    agree = (np.sign(out) == np.sign(clean)).mean()
    assert agree > 0.95


def test_tvl1_unobserved_filled_smoothly():
    # a hole (w=0) inside a constant region gets inpainted by TV
    f = np.ones((16, 16, 16), np.float32) * 0.5
    w = np.ones_like(f)
    f[7:9, 7:9, 7:9] = -5.0     # garbage values
    w[7:9, 7:9, 7:9] = 0.0      # ...but unobserved
    out = np.asarray(tvl1_refine(jnp.asarray(f), jnp.asarray(w),
                                 lam=5.0, n_iters=200))
    assert abs(out[8, 8, 8] - 0.5) < 0.2
