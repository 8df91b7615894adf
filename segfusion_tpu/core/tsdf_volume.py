"""Classic (non-learned) TSDF volume classes: host-facing API over the
device fusion kernels.

API-parity layer for the reference's native tsdf dep (reference
deps/tsdf/src/tsdf/TSDFVolume.pyx): ``TSDFVolume.fuse`` (truncated running
average + free-space votes, :166-251), ``sanity_fuse`` / visibility counting
(:253-313), ``MulticlassTSDFVolume.fuse`` (label-probability voting,
:348-442) and ``depth_rendering`` (:444-506). The per-voxel triple loops run
as the vectorised jitted kernels in ops.tsdf_fusion / ops.raycast; state
lives in HBM between calls.
"""

from __future__ import annotations

from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ..ops.raycast import render_depth
from ..ops.tsdf_fusion import (_voxel_centers_camera_projection, fuse_frame,
                               fuse_frame_multiclass)

__all__ = ["TSDFVolume", "MulticlassTSDFVolume", "Volume"]

_FREE_SPACE_UNSET = 10.0e7  # reference sentinel (TSDFVolume.pyx:234)


class TSDFVolume:
    """Truncated signed distance volume with free-space voting.

    Args:
      bbox: (3, 2) world-space bounds.
      resolution: voxel size.
      max_distance: truncation band (meters).
      free_space_vote: vote magnitude for voxels observed in free space.
    """

    def __init__(self, bbox, resolution: float, max_distance: float = 0.1,
                 free_space_vote: float = 1.0, init_value: float = 0.0):
        self.bbox = np.asarray(bbox, np.float64)
        self.resolution = float(resolution)
        self.max_distance = float(max_distance)
        self.free_space_vote = float(free_space_vote)
        shape = tuple(
            int(np.ceil((self.bbox[i, 1] - self.bbox[i, 0]) / resolution))
            for i in range(3))
        self.shape = shape
        self._tsdf = jnp.full(shape, init_value or max_distance, jnp.float32)
        self._weights = jnp.zeros(shape, jnp.float32)
        self._free_space = jnp.full(shape, _FREE_SPACE_UNSET, jnp.float32)
        self._update_mask = jnp.zeros(shape, jnp.int32)

    @property
    def origin(self):
        return self.bbox[:, 0].astype(np.float32)

    @property
    def volume(self):
        return np.asarray(self._tsdf)

    @property
    def weights(self):
        return np.asarray(self._weights)

    @property
    def free_space(self):
        return np.asarray(self._free_space)

    def get_mask(self):
        """Per-voxel observation count (reference update_mask,
        TSDFVolume.pyx:241)."""
        return np.asarray(self._update_mask)

    def fuse(self, depth_proj_matrix, depth_map,
             weight_map: Optional[np.ndarray] = None):
        """Fuse one depth frame (reference TSDFVolume.fuse,
        TSDFVolume.pyx:166-251), including the free-space votes for voxels
        between camera and surface."""
        proj = jnp.asarray(depth_proj_matrix, jnp.float32)
        depth = jnp.asarray(depth_map, jnp.float32)
        wmap = None if weight_map is None else jnp.asarray(weight_map,
                                                           jnp.float32)
        origin = jnp.asarray(self.origin)
        self._tsdf, self._weights = fuse_frame(
            self._tsdf, self._weights, depth, proj, origin,
            jnp.float32(self.resolution), jnp.float32(self.max_distance),
            wmap)
        (self._free_space, self._update_mask) = _free_space_and_mask(
            self._free_space, self._update_mask, depth, proj, origin,
            jnp.float32(self.resolution), jnp.float32(self.max_distance),
            jnp.float32(self.free_space_vote))

    def sanity_fuse(self, depth_proj_matrix, depth_map):
        """Visibility-only pass (reference sanity_fuse,
        TSDFVolume.pyx:253-313): counts voxels observed in-band without
        touching the TSDF."""
        proj = jnp.asarray(depth_proj_matrix, jnp.float32)
        depth = jnp.asarray(depth_map, jnp.float32)
        _, self._update_mask = _free_space_and_mask(
            self._free_space, self._update_mask, depth, proj,
            jnp.asarray(self.origin), jnp.float32(self.resolution),
            jnp.float32(self.max_distance), jnp.float32(0.0))

    def depth_rendering(self, extrinsics, intrinsics, shape: Tuple[int, int]):
        """Ray-march a depth map from the fused volume (reference
        depth_rendering, TSDFVolume.pyx:444-506)."""
        h, w = shape
        return np.asarray(render_depth(
            self._tsdf, jnp.asarray(extrinsics, jnp.float32),
            jnp.asarray(intrinsics, jnp.float32), jnp.asarray(self.origin),
            self.resolution, h, w))


@jax.jit
def _free_space_and_mask(free_space, update_mask, depth_map, proj, origin,
                         resolution, truncation, vote):
    """Free-space votes + in-band observation counting for one frame
    (reference TSDFVolume.pyx:230-241)."""
    h, w = depth_map.shape
    shape = free_space.shape
    px, py, pz = _voxel_centers_camera_projection(shape, origin, resolution,
                                                  proj)
    in_front = pz > 0
    safe_z = jnp.where(in_front, pz, 1.0)
    u = jnp.round(px / safe_z).astype(jnp.int32)
    v = jnp.round(py / safe_z).astype(jnp.int32)
    in_image = (u >= 0) & (u < w) & (v >= 0) & (v < h)
    lin = jnp.clip(v, 0, h - 1) * w + jnp.clip(u, 0, w - 1)
    depth = jnp.take(depth_map.reshape(-1), lin)
    valid = in_front & in_image & (depth != 0.0)
    sdf = depth - pz

    in_band = valid & (jnp.abs(sdf) <= truncation)
    free = valid & (sdf > truncation)

    fs = jnp.where(free & (free_space == _FREE_SPACE_UNSET), -vote,
                   jnp.where(free, free_space - vote, free_space))
    um = update_mask + in_band.astype(jnp.int32)
    return fs, um


class MulticlassTSDFVolume(TSDFVolume):
    """TSDF + per-voxel label-probability voting (reference
    MulticlassTSDFVolume.fuse, TSDFVolume.pyx:348-442)."""

    def __init__(self, bbox, resolution: float, n_classes: int,
                 max_distance: float = 0.1, **kw):
        super().__init__(bbox, resolution, max_distance, **kw)
        self.n_classes = int(n_classes)
        self._label_probs = jnp.zeros(self.shape + (self.n_classes,),
                                      jnp.float32)

    @property
    def label_probs(self):
        return np.asarray(self._label_probs)

    @property
    def labels(self):
        return np.asarray(jnp.argmax(self._label_probs, axis=-1)).astype(
            np.uint8)

    def fuse(self, depth_proj_matrix, depth_map, label_map,
             weight_map=None):
        proj = jnp.asarray(depth_proj_matrix, jnp.float32)
        depth = jnp.asarray(depth_map, jnp.float32)
        labels = jnp.asarray(label_map)
        origin = jnp.asarray(self.origin)
        (self._tsdf, self._weights,
         self._label_probs) = fuse_frame_multiclass(
            self._tsdf, self._weights, self._label_probs, depth, labels,
            proj, origin, jnp.float32(self.resolution),
            jnp.float32(self.max_distance))
        self._free_space, self._update_mask = _free_space_and_mask(
            self._free_space, self._update_mask, depth, proj, origin,
            jnp.float32(self.resolution), jnp.float32(self.max_distance),
            jnp.float32(self.free_space_vote))


class Volume:
    """Visibility counter volume (reference `Volume` in TSDFVolume.pyx):
    counts, per voxel, the frames in which it was observed."""

    def __init__(self, bbox, resolution: float):
        self.bbox = np.asarray(bbox, np.float64)
        self.resolution = float(resolution)
        shape = tuple(
            int(np.ceil((self.bbox[i, 1] - self.bbox[i, 0]) / resolution))
            for i in range(3))
        self.shape = shape
        self._count = jnp.zeros(shape, jnp.int32)
        self._free = jnp.full(shape, _FREE_SPACE_UNSET, jnp.float32)

    @property
    def volume(self):
        return np.asarray(self._count)

    def fuse(self, depth_proj_matrix, depth_map, truncation: float = 0.1):
        self._free, self._count = _free_space_and_mask(
            self._free, self._count, jnp.asarray(depth_map, jnp.float32),
            jnp.asarray(depth_proj_matrix, jnp.float32),
            jnp.asarray(self.bbox[:, 0], jnp.float32),
            jnp.float32(self.resolution), jnp.float32(truncation),
            jnp.float32(1.0))
