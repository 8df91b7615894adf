"""Spatially-sharded fusion: one scene's voxel grid split across the mesh.

For scenes whose volumes exceed a single chip's HBM (SURVEY.md §2.6 /
§5 distributed notes: "shard the voxel grid along x across chips over
ICI"), the SceneVolume arrays are placed with a NamedSharding that splits
the leading (x) axis across a 1-D mesh. The per-frame step is the ordinary
jitted program -- XLA's SPMD partitioner splits the gathers/scatters and
inserts the ICI collectives; results are bit-identical to the unsharded
step (verified on the virtual CPU mesh).
"""

from __future__ import annotations

from typing import Optional

import jax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..core.volume import SceneVolume

__all__ = ["shard_volume_spatial", "SpatialShardedFusion"]


def shard_volume_spatial(volume: SceneVolume, mesh: Mesh) -> SceneVolume:
    """Place a SceneVolume with its voxel arrays split along x across the
    mesh (origin/resolution replicated). The x extent must be divisible by
    the mesh size."""
    axis = mesh.axis_names[0]
    n = mesh.devices.size
    xs = volume.shape[0]
    if xs % n != 0:
        raise ValueError(f"volume x extent {xs} not divisible by mesh "
                         f"size {n} (pad with DATA.pad_shape_multiple)")
    vol_sharding = NamedSharding(mesh, P(axis, None, None))
    rep = NamedSharding(mesh, P())

    def put(x):
        if hasattr(x, "ndim") and x.ndim == 3:
            return jax.device_put(x, vol_sharding)
        return jax.device_put(x, rep)

    return jax.tree_util.tree_map(put, volume)


class SpatialShardedFusion:
    """Run Pipeline fusion steps over a spatially-sharded volume.

    Frames are replicated (small); the volume stays sharded across steps.
    Use for single huge scenes; for many normal scenes prefer
    parallel.scene_parallel (no collectives on the hot path).
    """

    def __init__(self, pipeline, mesh: Optional[Mesh] = None):
        from .mesh import scene_mesh
        self.pipeline = pipeline
        self.mesh = mesh if mesh is not None else scene_mesh("x")
        self._rep = NamedSharding(self.mesh, P())
        # CONSTRAINT: pallas_call does not auto-partition under XLA SPMD
        # (it would all-gather the sharded state onto every device), so
        # the sharded step must take the XLA row implementations. The
        # kernels themselves ARE multi-chip capable -- they are x-local,
        # and parallel/shard_kernels.py shard_maps them over x-slabs with
        # zero collectives -- but wiring shard_map through the pipeline's
        # scan carries is future work; until then spatial sharding forces
        # rows_impl="xla" and documents the cost.
        if self.mesh.devices.size > 1 and \
                getattr(pipeline, "rows_impl", None) == "pallas":
            raise ValueError(
                "SpatialShardedFusion over >1 device requires the XLA row "
                "implementations: set SETTINGS.rows_impl='xla' on the "
                "pipeline config (pallas_call does not partition under "
                "SPMD; see parallel/shard_kernels.py for the shard_map'd "
                "kernel wrappers)")

    def shard(self, volume: SceneVolume) -> SceneVolume:
        return shard_volume_spatial(volume, self.mesh)

    def step(self, params_and_stats, volume: SceneVolume, frame,
             seg_params=None) -> SceneVolume:
        frame = jax.tree_util.tree_map(
            lambda x: jax.device_put(x, self._rep), frame)
        return self.pipeline._step_fuse(params_and_stats, volume, frame,
                                        seg_params)

    def fuse_sequence(self, params_and_stats, volume: SceneVolume, frames,
                      seg_params=None) -> SceneVolume:
        """Fuse a whole (T, ...) frame stream over the x-sharded volume
        in one dispatch -- the row path with the dirty-shadow carry, XLA
        impl (see the constructor constraint); XLA SPMD partitions the
        slot gathers/scatters and shadow builds along x and inserts the
        ICI collectives."""
        frames = jax.tree_util.tree_map(
            lambda x: jax.device_put(x, self._rep), frames)
        return self.pipeline.fuse_sequence(params_and_stats, volume,
                                           frames, seg_params)
