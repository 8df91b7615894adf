"""Tests for median filter and distance transform vs scipy goldens."""

import numpy as np
import jax.numpy as jnp

from segfusion_tpu.ops.filters import median_filter3d, outlier_filter
from segfusion_tpu.ops.distance_transform import (distance_transform,
                                                  occupancy_to_sdf)


def test_median_filter_matches_scipy():
    from scipy.ndimage import median_filter
    rng = np.random.RandomState(0)
    vol = rng.randint(0, 8, (12, 13, 14)).astype(np.uint8)
    ours = np.asarray(median_filter3d(jnp.asarray(vol), size=3))
    ref = median_filter(vol, size=3, mode="nearest")
    assert (ours == ref).mean() > 0.999  # boundary modes may differ slightly
    # interior must match exactly
    np.testing.assert_array_equal(ours[1:-1, 1:-1, 1:-1],
                                  ref[1:-1, 1:-1, 1:-1])


def test_median_filter_size5_smooths_labels():
    vol = np.zeros((10, 10, 10), np.uint8)
    vol[5, 5, 5] = 7  # single-voxel noise
    out = np.asarray(median_filter3d(jnp.asarray(vol), size=5))
    assert out[5, 5, 5] == 0


def test_outlier_filter():
    tsdf = jnp.asarray(np.random.RandomState(1).randn(4, 4, 4).astype(np.float32))
    w = jnp.asarray(np.arange(64, dtype=np.float32).reshape(4, 4, 4))
    nt, nw = outlier_filter(tsdf, w, threshold=32.0, init_value=0.1)
    nt, nw = np.asarray(nt), np.asarray(nw)
    assert np.all(nt.reshape(-1)[:32] == 0.1)
    assert np.all(nw.reshape(-1)[:32] == 0)
    np.testing.assert_allclose(nt.reshape(-1)[32:],
                               np.asarray(tsdf).reshape(-1)[32:])


def test_distance_transform_matches_scipy():
    from scipy.ndimage import distance_transform_edt
    rng = np.random.RandomState(2)
    occ = rng.rand(16, 17, 18) > 0.95
    f = np.where(occ, 0.0, 1e12).astype(np.float32)
    ours = np.sqrt(np.asarray(distance_transform(jnp.asarray(f))))
    ref = distance_transform_edt(~occ)
    np.testing.assert_allclose(ours, ref, atol=1e-3)


def test_occupancy_to_sdf_signs():
    occ = np.zeros((16, 16, 16), bool)
    occ[6:10, 6:10, 6:10] = True
    sdf = np.asarray(occupancy_to_sdf(jnp.asarray(occ.astype(np.float32)),
                                      resolution=0.1))
    assert sdf[8, 8, 8] < 0        # inside the block
    assert sdf[0, 0, 0] > 0        # far outside
    # magnitude grows with distance outside
    assert sdf[0, 8, 8] > sdf[4, 8, 8] > 0
