"""Multi-device scaling: mesh helpers, sharded training/fusion steps."""

from .mesh import data_parallel_mesh, replicate, scene_mesh, shard_batch
