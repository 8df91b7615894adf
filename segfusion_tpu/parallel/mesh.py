"""Device mesh helpers: data-parallel and scene-parallel sharding.

The reference's only multi-device code is a single-process nn.DataParallel
wrap (reference train_segmentation.py:169-172). The TPU-native equivalent:
a 1-D ``jax.sharding.Mesh`` over all local devices with NamedSharding --
inputs are sharded on the batch (or scene) axis, parameters are replicated,
and XLA inserts the gradient all-reduce over ICI automatically when the
train step is jitted with sharded inputs.
"""

from __future__ import annotations

from typing import Any

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

__all__ = ["data_parallel_mesh", "shard_batch", "replicate", "scene_mesh"]


def data_parallel_mesh(axis_name: str = "data",
                       devices=None) -> Mesh:
    devices = devices if devices is not None else jax.devices()
    return Mesh(np.asarray(devices), (axis_name,))


def scene_mesh(axis_name: str = "scene", devices=None) -> Mesh:
    """Mesh for scene-parallel fusion: each device owns whole scenes
    (volume + frame stream), the natural parallel axis of the online
    fusion workload (SURVEY.md §2.6)."""
    return data_parallel_mesh(axis_name, devices)


def shard_batch(mesh: Mesh, tree: Any, axis: int = 0):
    """Shard every array leaf along ``axis`` across the mesh; leaves whose
    dim is not divisible by the mesh size are replicated."""
    axis_name = mesh.axis_names[0]
    n = mesh.devices.size

    def put(x):
        if not hasattr(x, "shape") or x.ndim <= axis \
                or x.shape[axis] % n != 0:
            return jax.device_put(x, NamedSharding(mesh, P()))
        spec = [None] * x.ndim
        spec[axis] = axis_name
        return jax.device_put(x, NamedSharding(mesh, P(*spec)))

    return jax.tree_util.tree_map(put, tree)


def replicate(mesh: Mesh, tree: Any):
    sharding = NamedSharding(mesh, P())
    return jax.tree_util.tree_map(
        lambda x: jax.device_put(x, sharding) if hasattr(x, "shape") else x,
        tree)
