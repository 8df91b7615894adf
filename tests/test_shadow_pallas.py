"""Pallas shadow-build kernel: bit-exactness vs the XLA build_shadow.

Runs in interpret mode on the CPU mesh (the TPU compile path is exercised
by tools/probe_shadow_pallas.py on hardware)."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from segfusion_tpu.ops import rowvol
from segfusion_tpu.ops.pallas.shadow_build import (_f16_bits,
                                                   build_shadow_pallas)


def test_f16_bits_matches_xla_convert():
    rng = np.random.RandomState(0)
    vals = np.concatenate([
        rng.randn(4096).astype(np.float32) * 0.1,          # typical tsdf
        rng.randn(4096).astype(np.float32) * 100.0,        # large weights
        rng.uniform(1e-9, 1e-4, 2048).astype(np.float32),  # f16 subnormals
        np.array([0.0, -0.0, np.inf, -np.inf, np.nan,
                  65504.0, 65520.0, -65520.0, 1e9, -1e9,
                  6.1e-5, 5.96e-8, 2.98e-8, -2.98e-8, 1e-10,
                  2.0 ** -24, 2.0 ** -25, 1.5 * 2.0 ** -25],
                 np.float32),
    ])
    # pad to a (rows, 128) lane shape
    n = -(-vals.size // 128) * 128
    vals = np.pad(vals, (0, n - vals.size)).reshape(-1, 128)
    got = np.asarray(jax.jit(_f16_bits)(jnp.asarray(vals)))
    want = np.asarray(
        jax.lax.bitcast_convert_type(
            jnp.asarray(vals).astype(jnp.float16), jnp.uint16)
    ).astype(np.uint32)
    # nan payloads may differ in mantissa bits; compare nans by nan-ness
    isnan = np.isnan(vals)
    assert np.array_equal(got[~isnan] & 0xFFFF, want[~isnan])
    got_h = (got[isnan] & 0x7FFF)
    assert np.all(got_h > 0x7C00)          # still a nan pattern


@pytest.mark.parametrize("shape", [(24, 20, 160), (16, 17, 300),
                                   (8, 12, 96)])
def test_build_shadow_pallas_matches_xla(shape):
    L = rowvol.RowLayout.for_shape(shape)
    rng = np.random.RandomState(1)
    geo = jnp.asarray(
        rng.randn(L.rows, 512).astype(np.float32) * 0.3)
    want = jax.jit(rowvol.build_shadow, static_argnums=1)(geo, L)
    got = build_shadow_pallas(geo, L, interpret=True)
    assert got.shape == want.shape
    assert np.array_equal(np.asarray(got), np.asarray(want))
