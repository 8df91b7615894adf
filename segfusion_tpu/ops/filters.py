"""Volume filters: 3D median filter, outlier filter.

Device-side equivalents of the reference's post-processing
(scipy.ndimage.median_filter over the label volume,
reference modules/database.py:114-116, and the weight-threshold outlier
filter, modules/database.py:108-112). The median filter is expressed as a
rank-selection over a static neighborhood gather -- one vectorised XLA
program, no host round-trip.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

__all__ = ["median_filter3d", "outlier_filter"]


@functools.partial(jax.jit, static_argnames=("size",))
def median_filter3d(volume: jnp.ndarray, size: int = 5) -> jnp.ndarray:
    """3D median filter with edge replication.

    For a size^3 neighborhood the median is computed by sorting the
    size^3 gathered values along a new axis (static shapes; XLA sorts on
    the VPU). uint8 label volumes stay uint8.
    """
    assert size % 2 == 1, "median filter size must be odd"
    r = size // 2
    padded = jnp.pad(volume, r, mode="edge")
    xs, ys, zs = volume.shape

    # stack the size^3 shifted views: (k, xs, ys, zs)
    views = []
    for dx in range(size):
        for dy in range(size):
            for dz in range(size):
                views.append(jax.lax.dynamic_slice(
                    padded, (dx, dy, dz), (xs, ys, zs)))
    stack = jnp.stack(views, axis=0)
    k = size ** 3
    med = jnp.sort(stack, axis=0)[k // 2]
    return med.astype(volume.dtype)


@jax.jit
def outlier_filter(tsdf: jnp.ndarray, weights: jnp.ndarray,
                   threshold: float, init_value: float):
    """Reset voxels observed fewer than ``threshold`` times
    (reference modules/database.py:108-112)."""
    keep = weights >= threshold
    return (jnp.where(keep, tsdf, init_value),
            jnp.where(keep, weights, 0.0))
