"""Scene-parallel fusion: N scenes fused simultaneously across a device mesh.

The natural scaling axis of online fusion is the scene (SURVEY.md §2.6): the
per-frame recurrence is sequential within a scene but independent across
scenes. This runner stacks N same-shape scene volumes on a leading axis,
shards that axis over a 1-D mesh, and vmaps the per-frame step -- each chip
owns whole scenes (volume + frame stream), parameters are replicated, no
collectives are needed on the hot path. Aggregate throughput scales
linearly with chips.
"""

from __future__ import annotations

import functools
from typing import Dict, List, Optional

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..core.pipeline import Pipeline
from ..core.volume import SceneVolume

__all__ = ["SceneParallelFusion", "stack_volumes", "unstack_volumes"]


def stack_volumes(volumes: List[SceneVolume]) -> SceneVolume:
    """Stack same-shape SceneVolumes on a new leading scene axis."""
    shapes = {v.shape for v in volumes}
    if len(shapes) != 1:
        raise ValueError(
            f"scene-parallel fusion needs equal volume shapes, got {shapes} "
            "(use DATA.pad_shape_multiple to bucket shapes)")
    return jax.tree_util.tree_map(lambda *xs: jnp.stack(xs), *volumes)


def unstack_volumes(stacked: SceneVolume, n: int) -> List[SceneVolume]:
    return [jax.tree_util.tree_map(lambda x: x[i], stacked)
            for i in range(n)]


class SceneParallelFusion:
    """vmap + shard the per-frame fusion step over a scene axis.

    Args:
      pipeline: a configured Pipeline.
      mesh: 1-D jax.sharding.Mesh (axis 'scene'); defaults to all devices.
    """

    def __init__(self, pipeline: Pipeline, mesh: Optional[Mesh] = None):
        self.pipeline = pipeline
        if mesh is None:
            from .mesh import scene_mesh
            mesh = scene_mesh()
        self.mesh = mesh
        self._all_devices = np.asarray(mesh.devices).reshape(-1)
        self._scene_sharding = NamedSharding(mesh, P(mesh.axis_names[0]))
        self._replicated = NamedSharding(mesh, P())

        @functools.partial(jax.jit, donate_argnums=(1,))
        def _step(params_and_stats, volumes, frames, seg_params):
            def per_scene(volume, frame):
                return pipeline.step_fuse_impl(params_and_stats, volume,
                                               frame, seg_params)
            return jax.vmap(per_scene)(volumes, frames)

        self._step = _step

        @functools.partial(jax.jit, donate_argnums=(1,))
        def _seq(params_and_stats, volumes, frames, seg_params):
            def per_scene(volume, stream):
                return pipeline.fuse_sequence_impl(params_and_stats, volume,
                                                   stream, seg_params)
            return jax.vmap(per_scene)(volumes, frames)

        self._seq = _seq

    def _fit_mesh(self, n_scenes: int) -> None:
        """Fit the mesh to the largest divisor of ``n_scenes`` (XLA
        rejects sharding a dim-S axis over a non-divisor mesh; idle
        trailing devices cost nothing). Always refit from the FULL
        device set so a small batch (2 scenes on 8 chips) doesn't
        permanently shrink the runner for later larger batches."""
        size = self._all_devices.size
        d = max(k for k in range(1, min(size, n_scenes) + 1)
                if n_scenes % k == 0)
        if d == self.mesh.devices.size:
            return
        self.mesh = Mesh(self._all_devices[:d], self.mesh.axis_names)
        self._scene_sharding = NamedSharding(self.mesh,
                                             P(self.mesh.axis_names[0]))
        self._replicated = NamedSharding(self.mesh, P())

    def shard_volumes(self, stacked: SceneVolume) -> SceneVolume:
        self._fit_mesh(stacked.num.shape[0])
        return jax.tree_util.tree_map(
            lambda x: jax.device_put(x, self._scene_sharding
                                     if x.ndim > 1 or x.shape[0] > 1
                                     else self._replicated),
            stacked)

    def replicate(self, tree):
        return jax.device_put(tree, self._replicated)

    def step(self, params_and_stats, volumes: SceneVolume,
             frames: Dict[str, jnp.ndarray],
             seg_params=None) -> SceneVolume:
        """One frame per scene: ``frames`` leaves have leading scene axis.
        Returns the updated stacked volumes (donated in place)."""
        self._fit_mesh(volumes.num.shape[0])
        frames = jax.tree_util.tree_map(
            lambda x: jax.device_put(jnp.asarray(x), self._scene_sharding),
            frames)
        return self._step(params_and_stats, volumes, frames, seg_params)

    def run_sequences(self, params_and_stats, volumes: SceneVolume,
                      frames: Dict[str, jnp.ndarray],
                      seg_params=None) -> SceneVolume:
        """Fuse whole frame streams for all scenes in ONE dispatch:
        ``frames`` leaves have shape (S, T, ...), ``volumes`` is the
        stacked (S, ...) state. The scene axis is vmapped (sharded over
        the mesh), the time axis is the fuse_sequence lax.scan -- the
        production shape for multi-scene streaming (BASELINE.json
        config #5)."""
        self._fit_mesh(volumes.num.shape[0])
        frames = jax.tree_util.tree_map(
            lambda x: jax.device_put(jnp.asarray(x), self._scene_sharding),
            frames)
        return self._seq(params_and_stats, volumes, frames, seg_params)

    def run(self, params_and_stats, volumes: List[SceneVolume],
            frame_streams: List[List[Dict]], seg_params=None
            ) -> List[SceneVolume]:
        """Fuse aligned frame streams (stream i belongs to scene i)."""
        n = len(volumes)
        stacked = self.shard_volumes(stack_volumes(volumes))
        n_frames = min(len(fs) for fs in frame_streams)
        for t in range(n_frames):
            batch = jax.tree_util.tree_map(
                lambda *xs: jnp.stack([jnp.asarray(x) for x in xs]),
                *[frame_streams[i][t] for i in range(n)])
            stacked = self.step(params_and_stats, stacked, batch, seg_params)
        return unstack_volumes(stacked, n)
