"""shard_map wrappers for the slot-layout Pallas kernels over an
x-sharded volume.

``pallas_call`` does not auto-partition under XLA's SPMD: jitting the
row path with a sharded geo state would gather the full state onto every
device before running the kernel. But all four shadow/reconcile kernels
are X-LOCAL by construction -- a voxel's reconcile reads only the 4
neighbour slots at the SAME x (the x-corner axis is handled by the
scatter writing two different x rows, ops/rowvol.py SLOT LAYOUT), the
kernel grid is x-major, and the row arrays are x-major flat -- so a
contiguous dim-0 shard of ``geo``/``key``/``shadow`` rows IS a
standalone sub-volume with X' = X / n. These wrappers shard_map each
kernel over a 1-D mesh axis with zero collectives: each device runs the
kernel on its own x-slab.

Used by ``parallel.spatial.SpatialShardedFusion`` for multi-chip scenes
(SURVEY.md §2.6 spatial sharding over ICI); bit-exactness vs the
unsharded kernels is pinned on the 8-device CPU mesh in
tests/test_shard_kernels.py.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, PartitionSpec as P

from ..ops import rowvol

__all__ = ["sharded_build_shadow", "sharded_build_shadow_dirty",
           "sharded_reconcile_slot", "sharded_reconcile_key",
           "check_x_divisible"]


def _shard_map(f, mesh, in_specs, out_specs):
    try:
        from jax import shard_map  # jax >= 0.6
        return shard_map(f, mesh=mesh, in_specs=in_specs,
                         out_specs=out_specs, check_vma=False)
    except (ImportError, TypeError):
        from jax.experimental.shard_map import shard_map
        return shard_map(f, mesh=mesh, in_specs=in_specs,
                         out_specs=out_specs, check_rep=False)


def check_x_divisible(layout: rowvol.RowLayout, mesh: Mesh, axis: str
                      ) -> int:
    n = mesh.shape[axis]
    if layout.X % n != 0:
        raise ValueError(
            f"volume x extent {layout.X} not divisible by mesh axis "
            f"'{axis}' size {n} (pad with DATA.pad_shape_multiple)")
    return n


def sharded_build_shadow(geo: jnp.ndarray, layout: rowvol.RowLayout,
                         mesh: Mesh, axis: str = "x",
                         interpret: bool = False) -> jnp.ndarray:
    """``rowvol.build_shadow`` (Pallas) over an x-sharded geo state: each
    device builds the shadow of its own x-slab; no collectives."""
    n = check_x_divisible(layout, mesh, axis)
    Ls = layout._replace(X=layout.X // n)

    def body(g):
        from ..ops.pallas.shadow_build import build_shadow_pallas_v
        return build_shadow_pallas_v(g, Ls, interpret)

    return _shard_map(body, mesh, (P(axis, None),), P(axis, None))(geo)


def sharded_build_shadow_dirty(geo: jnp.ndarray, prev_shadow: jnp.ndarray,
                               dirty: jnp.ndarray,
                               layout: rowvol.RowLayout, mesh: Mesh,
                               axis: str = "x",
                               interpret: bool = False) -> jnp.ndarray:
    """``rowvol.build_shadow_dirty`` over x-sharded geo/shadow states.
    ``dirty`` is the global (X * NJ + 1,) tile mask (trailing sentinel,
    rowvol.dirty_tile_mask); the tile grid is x-major, so its first
    X * NJ entries shard into per-slab masks and each shard re-appends
    its own sentinel."""
    n = check_x_divisible(layout, mesh, axis)
    Ls = layout._replace(X=layout.X // n)
    _, NJ = rowvol.shadow_tiling(layout)
    nt = layout.X * NJ

    def body(g, p, d):
        from ..ops.pallas.shadow_build import build_shadow_dirty_pallas_v
        d_local = jnp.concatenate([d, jnp.zeros((1,), jnp.int32)])
        return build_shadow_dirty_pallas_v(g, p, d_local, Ls, interpret)

    return _shard_map(
        body, mesh, (P(axis, None), P(axis, None), P(axis)),
        P(axis, None))(geo, prev_shadow, dirty[:nt])


def sharded_reconcile_slot(geo: jnp.ndarray, layout: rowvol.RowLayout,
                           mesh: Mesh, axis: str = "x",
                           interpret: bool = False):
    """``reconcile_slot_pallas`` over an x-sharded geo state ->
    x-sharded canonical (num, w) planes of shape (X, Y, Z)."""
    n = check_x_divisible(layout, mesh, axis)
    Ls = layout._replace(X=layout.X // n)

    def body(g):
        from ..ops.pallas.shadow_build import reconcile_slot_pallas_v
        return reconcile_slot_pallas_v(g, Ls, interpret)

    return _shard_map(body, mesh, (P(axis, None),),
                      (P(axis, None, None), P(axis, None, None)))(geo)


def sharded_reconcile_key(key: jnp.ndarray, layout: rowvol.RowLayout,
                          mesh: Mesh, axis: str = "x",
                          interpret: bool = False) -> jnp.ndarray:
    """``reconcile_key_pallas`` over an x-sharded key state ->
    x-sharded canonical (X, Y, Z) packed keys."""
    n = check_x_divisible(layout, mesh, axis)
    Ls = layout._replace(X=layout.X // n)

    def body(k):
        from ..ops.pallas.shadow_build import reconcile_key_pallas_v
        return reconcile_key_pallas_v(k, Ls, interpret)

    return _shard_map(body, mesh, (P(axis, None),),
                      P(axis, None, None))(key)
