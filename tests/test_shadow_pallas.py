"""Pallas shadow-build kernel: bit-exactness vs the XLA build_shadow.

Runs in interpret mode on the CPU mesh (the TPU compile path is exercised
by tools/probe_shadow_pallas.py on hardware)."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from segfusion_tpu.ops import rowvol
from segfusion_tpu.ops.geometry import pack16_numw, unpack16_numw
from segfusion_tpu.ops.pallas.shadow_build import (_pack16,
                                                   build_shadow_pallas)


def _edge_floats(rng):
    return np.concatenate([
        rng.randn(4096).astype(np.float32) * 0.1,          # typical tsdf
        rng.randn(4096).astype(np.float32) * 1000.0,       # large weights
        rng.uniform(1e-9, 1e-4, 2048).astype(np.float32),  # tiny weights
        np.array([0.0, -0.0, 65504.0, 1e9, -1e9, 3.4e38,
                  1e-38, -1e-38, 1.0 + 2 ** -9, 1.0 + 2 ** -8],
                 np.float32),
    ])


def test_kernel_pack_matches_pack16_numw():
    """The kernel's i32-bitcast bf16 pack == geometry.pack16_numw."""
    rng = np.random.RandomState(0)
    vals = _edge_floats(rng)
    n = -(-vals.size // 128) * 128
    num = np.pad(vals, (0, n - vals.size)).reshape(-1, 128)
    w = np.abs(num[::-1].copy())
    got = np.asarray(jax.jit(_pack16)(jnp.asarray(num), jnp.asarray(w)))
    want = np.asarray(jax.jit(pack16_numw)(jnp.asarray(num),
                                           jnp.asarray(w)))
    assert np.array_equal(got, want)


def test_unpack_roundtrip_is_bf16():
    rng = np.random.RandomState(1)
    x = rng.randn(256, 128).astype(np.float32) * 5.0
    w = np.abs(rng.randn(256, 128).astype(np.float32)) * 100.0
    n2, w2 = jax.jit(unpack16_numw)(jax.jit(pack16_numw)(
        jnp.asarray(x), jnp.asarray(w)))
    assert np.array_equal(np.asarray(n2),
                          x.astype(jnp.bfloat16).astype(np.float32))
    assert np.array_equal(np.asarray(w2),
                          w.astype(jnp.bfloat16).astype(np.float32))


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
