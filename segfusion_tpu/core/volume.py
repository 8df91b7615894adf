"""Scene volume state: Voxelgrid bbox math + device-resident SceneVolume.

Re-designs the reference's `graphics.Voxelgrid` (deps/graphics, used via
modules/database.py:60-76) and the per-scene volume quadruple (estimated
TSDF, fusion weights, semantic ids, semantic scores). The TPU-native design
keeps all four arrays as one pytree that lives in HBM and is threaded through
the jitted per-frame step with buffer donation -- eliminating the reference's
per-frame whole-volume host<->device copies (modules/extractor.py:43-49,
modules/integrator.py:79-88).
"""

from __future__ import annotations

import dataclasses
import functools
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

__all__ = ["Voxelgrid", "SceneVolume", "init_scene_volume"]


class Voxelgrid:
    """Host-side voxel grid: an array + bbox/origin/resolution metadata.

    Mirrors the reference's graphics.Voxelgrid contract (constructed with a
    resolution, filled with ``from_array(volume, bbox)``; consumed via
    ``.volume``, ``.origin``, ``.bbox``, ``.resolution`` --
    reference modules/database.py:60-76, dataset/replica.py:297-332).
    """

    def __init__(self, resolution: float):
        self.resolution = float(resolution)
        self.volume: Optional[np.ndarray] = None
        self.bbox: Optional[np.ndarray] = None

    def from_array(self, array: np.ndarray, bbox: np.ndarray):
        assert array.ndim == 3
        self.volume = array
        self.bbox = np.asarray(bbox, dtype=np.float64)
        return self

    @classmethod
    def create(cls, bbox, resolution: float, init_value=0.0,
               dtype=np.float32) -> "Voxelgrid":
        bbox = np.asarray(bbox, dtype=np.float64)
        shape = tuple(
            int(np.ceil((bbox[i, 1] - bbox[i, 0]) / resolution))
            for i in range(3))
        grid = cls(resolution)
        grid.from_array(np.full(shape, init_value, dtype=dtype), bbox)
        return grid

    @property
    def origin(self) -> np.ndarray:
        return self.bbox[:, 0].astype(np.float32)

    @property
    def shape(self) -> Tuple[int, int, int]:
        return tuple(self.volume.shape)

    def world_to_voxel(self, points: np.ndarray) -> np.ndarray:
        return (np.asarray(points) - self.origin[None, :]) / self.resolution

    def voxel_to_world(self, indices: np.ndarray) -> np.ndarray:
        return np.asarray(indices) * self.resolution + self.origin[None, :]


@functools.partial(jax.tree_util.register_dataclass,
                   data_fields=("num", "weights", "semkey", "origin",
                                "resolution"),
                   meta_fields=("init_value",))
@dataclasses.dataclass
class SceneVolume:
    """Device-resident per-scene fusion state (a JAX pytree).

    TPU-native accumulator representation: instead of the reference's
    materialised (tsdf, weights, ids, scores) quadruple
    (modules/database.py:81-103), the state stores

      * ``num``    = sum of (weight * tsdf_update)  -- f32
      * ``weights``= sum of weights                 -- f32
      * ``semkey`` = packed monotonic (score, id)   -- int32

    so per-frame integration is pure in-place scatter-adds / scatter-max
    (see ops.integrate.integrate_numw) with zero full-volume passes. The
    reference-visible views ``tsdf`` (= num/w, init_value where unobserved),
    ``semantics`` and ``scores`` are materialised on access -- cheap at
    eval/save boundaries, fused into the gather when inside jit.
    """

    num: jnp.ndarray           # (xs, ys, zs) float32, sum(w * v)
    weights: jnp.ndarray       # (xs, ys, zs) float32, sum(w)
    semkey: jnp.ndarray        # (xs, ys, zs) int32 packed (score, id)
    origin: jnp.ndarray        # (3,) float32
    resolution: jnp.ndarray    # () float32
    init_value: float = 0.1    # static: truncation band / unobserved value

    @property
    def shape(self):
        return self.num.shape

    @property
    def tsdf(self) -> jnp.ndarray:
        """Materialised TSDF estimate (reference 'current' volume)."""
        w = self.weights
        return jnp.where(w > 0, self.num / jnp.maximum(w, 1e-12),
                         jnp.float32(self.init_value))

    @property
    def semantics(self) -> jnp.ndarray:
        """Materialised uint8 label volume (reference 'ids_est')."""
        from ..ops.integrate import unpack_semantic_key
        return unpack_semantic_key(self.semkey)[1]

    @property
    def scores(self) -> jnp.ndarray:
        """Materialised score volume (reference 'scores')."""
        from ..ops.integrate import unpack_semantic_key
        return unpack_semantic_key(self.semkey)[0]

    def reset(self, init_value: float | None = None) -> "SceneVolume":
        """Fresh state, same geometry (reference modules/database.py:351-370)."""
        return SceneVolume(
            num=jnp.zeros_like(self.num),
            weights=jnp.zeros_like(self.weights),
            semkey=jnp.zeros_like(self.semkey),
            origin=self.origin,
            resolution=self.resolution,
            init_value=float(init_value if init_value is not None
                             else self.init_value),
        )


def init_scene_volume(shape: Tuple[int, int, int], origin, resolution: float,
                      init_value: float = 0.1,
                      device=None) -> SceneVolume:
    """Allocate a fresh SceneVolume in HBM (or on ``device``)."""
    def put(x):
        return jax.device_put(x, device) if device is not None else x

    return SceneVolume(
        num=put(jnp.zeros(shape, jnp.float32)),
        weights=put(jnp.zeros(shape, jnp.float32)),
        semkey=put(jnp.zeros(shape, jnp.int32)),
        origin=put(jnp.asarray(origin, jnp.float32)),
        resolution=put(jnp.asarray(resolution, jnp.float32)),
        init_value=float(init_value),
    )
