"""Squared Euclidean distance transform (Felzenszwalb-Huttenlocher).

Device-side re-implementation of the reference's Cython dt dep
(reference deps/distance-transform/dt.pyx:47-147, used by
graphics.transform.compute_tsdf to turn occupancy grids into unsigned
distance fields). The N-D transform is axis-separable; each 1-D pass
computes d(i) = min_j (f(j) + (i-j)^2).

The classic lower-envelope algorithm is inherently sequential per row; on
TPU the min-plus form is computed instead as a blocked vectorised reduction
over j (O(n^2) FLOPs but fully parallel over rows and elementwise on the
VPU -- for the <=512-voxel rows of this workload it is far faster than a
sequential scan).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

__all__ = ["distance_transform_1d", "distance_transform", "occupancy_to_sdf"]

INF = 1e12


@functools.partial(jax.jit, static_argnames=("block",))
def distance_transform_1d(f: jnp.ndarray, block: int = 128) -> jnp.ndarray:
    """1-D squared-distance transform along the last axis.

    Args:
      f: (..., n) costs (0 at sources, INF elsewhere).
    Returns:
      (..., n) with out[..., i] = min_j f[..., j] + (i - j)^2.
    """
    n = f.shape[-1]
    idx = jnp.arange(n, dtype=jnp.float32)

    def body(carry, j0):
        out = carry
        js = j0 + jnp.arange(block, dtype=jnp.float32)       # (block,)
        valid = js < n
        fj = jax.lax.dynamic_slice_in_dim(
            jnp.pad(f, [(0, 0)] * (f.ndim - 1) + [(0, block)],
                    constant_values=INF),
            j0, block, axis=-1)                              # (..., block)
        # cost[..., i, b] = fj[..., b] + (i - js[b])^2
        d = idx[:, None] - js[None, :]                       # (n, block)
        cost = fj[..., None, :] + d * d
        cost = jnp.where(valid, cost, INF)
        out = jnp.minimum(out, jnp.min(cost, axis=-1))
        return out, None

    n_blocks = -(-n // block)
    starts = jnp.arange(n_blocks) * block
    out0 = jnp.full(f.shape, INF, jnp.float32)
    out, _ = jax.lax.scan(body, out0, starts)
    return out


def distance_transform(f: jnp.ndarray) -> jnp.ndarray:
    """N-D squared Euclidean distance transform (separable passes)."""
    out = jnp.asarray(f, jnp.float32)
    for axis in range(out.ndim):
        moved = jnp.moveaxis(out, axis, -1)
        moved = distance_transform_1d(moved)
        out = jnp.moveaxis(moved, -1, axis)
    return out


def occupancy_to_sdf(occupancy: jnp.ndarray, resolution: float = 1.0,
                     truncation: float | None = None) -> jnp.ndarray:
    """Occupancy grid -> signed distance field via two distance transforms
    (the reference's compute_tsdf path,
    deps/graphics/src/graphics/transform.py:7-26): distance to the occupied
    set outside, negative distance to the free set inside."""
    occ = occupancy > 0
    f_out = jnp.where(occ, 0.0, INF)
    f_in = jnp.where(occ, INF, 0.0)
    d_out = jnp.sqrt(distance_transform(f_out)) * resolution
    d_in = jnp.sqrt(distance_transform(f_in)) * resolution
    sdf = jnp.where(occ, -d_in, d_out)
    if truncation is not None:
        sdf = jnp.clip(sdf, -truncation, truncation)
    return sdf
