"""Pallas median3d kernel vs the XLA formulation (interpret mode on CPU;
the compiled path runs on TPU via Database.filter_semantics)."""

import numpy as np
import jax.numpy as jnp
import pytest

from segfusion_tpu.ops.filters import median_filter3d
from segfusion_tpu.ops.pallas.median3d import median_filter3d_pallas


@pytest.mark.parametrize("shape", [(20, 22, 30), (8, 8, 128), (33, 17, 5)])
def test_pallas_median_matches_xla(shape):
    rng = np.random.RandomState(1)
    vol = rng.randint(0, 12, shape).astype(np.uint8)
    a = np.asarray(median_filter3d(jnp.asarray(vol), size=3))
    b = np.asarray(median_filter3d_pallas(jnp.asarray(vol), size=3,
                                          interpret=True))
    np.testing.assert_array_equal(a, b)


def test_pallas_median_size5():
    rng = np.random.RandomState(2)
    vol = rng.randint(0, 5, (16, 16, 24)).astype(np.uint8)
    a = np.asarray(median_filter3d(jnp.asarray(vol), size=5))
    b = np.asarray(median_filter3d_pallas(jnp.asarray(vol), size=5,
                                          interpret=True))
    np.testing.assert_array_equal(a, b)
