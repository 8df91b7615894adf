"""Multi-host (DCN) scaling: process initialization + scene sharding plan.

The reference is strictly single-process (SURVEY.md §2.6: no NCCL/MPI/
Gloo anywhere), so nothing here is required for parity -- this module
documents and provides the TPU-native growth path beyond one host.

Design (matches the workload's structure):

* The online-fusion workload is embarrassingly parallel over SCENES --
  each scene is a (volume state, frame stream) pair with zero cross-scene
  communication. Across hosts the right split is therefore scene-level
  DATA sharding over DCN: each host process owns a disjoint subset of
  scene trajectories (shard the scene list by ``process_index``), runs the
  ordinary single-host scene-parallel pipeline over its local chips
  (parallel/scene_parallel.py), and only AGGREGATE quantities -- training
  gradients, eval metric sums -- cross DCN, via the same ``psum`` the
  in-host data-parallel path already uses. No voxel data ever crosses DCN.
* Spatial volume sharding (parallel/spatial.py) stays INTRA-host: its
  per-frame gather/scatter collectives need ICI bandwidth; over DCN they
  would dominate the step. A single scene larger than one HOST's HBM is
  out of scope (the reference caps scenes far below that).
* Segmentation training scales across hosts with the standard recipe: a
  global batch sharded over all processes' devices; ``pjit`` inserts the
  cross-host gradient all-reduce (DCN-aware reduction order is XLA's
  job, not ours).

``initialize()`` wires ``jax.distributed`` behind a config flag
(SETTINGS.multihost). Single-process behaviour is unchanged when the flag
is off (the default) -- tests and the driver env never initialize DCN.
"""

from __future__ import annotations

from typing import Optional, Sequence

import jax

__all__ = ["initialize", "local_scene_shard", "is_multihost"]

_initialized = False


def initialize(config=None, coordinator_address: Optional[str] = None,
               num_processes: Optional[int] = None,
               process_id: Optional[int] = None) -> bool:
    """Initialize ``jax.distributed`` when multi-host mode is requested.

    Reads SETTINGS.multihost (bool) and optional
    SETTINGS.coordinator_address / SETTINGS.num_processes /
    SETTINGS.process_id from ``config``; explicit kwargs win. On TPU pods
    the three None defaults let JAX auto-discover the topology. Returns
    True if distributed mode is active. Idempotent."""
    global _initialized
    if _initialized:
        return True
    settings = getattr(config, "SETTINGS", None)
    want = bool(getattr(settings, "multihost", False)) if settings is not None \
        else coordinator_address is not None
    if not want and coordinator_address is None:
        return False
    if settings is not None:
        coordinator_address = coordinator_address or \
            settings.get("coordinator_address", None)
        num_processes = num_processes or settings.get("num_processes", None)
        process_id = process_id if process_id is not None \
            else settings.get("process_id", None)
    jax.distributed.initialize(coordinator_address=coordinator_address,
                               num_processes=num_processes,
                               process_id=process_id)
    _initialized = True
    return True


def is_multihost() -> bool:
    return jax.process_count() > 1


def local_scene_shard(scenes: Sequence[str]) -> list:
    """This process's scene subset: contiguous round-robin split of the
    global scene list by process index (deterministic, no communication).
    With one process this is the identity -- the single-host paths call it
    unconditionally."""
    n = jax.process_count()
    i = jax.process_index()
    return [s for k, s in enumerate(scenes) if k % n == i]
