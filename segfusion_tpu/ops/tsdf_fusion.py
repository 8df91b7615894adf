"""Classic (non-learned) TSDF fusion: voxel-parallel project-and-accumulate.

TPU-native re-design of the reference's native fusion kernels:
  * tsdf.TSDFVolume.fuse -- Cython per-voxel loop with truncated running
    average + free-space votes (reference deps/tsdf/src/tsdf/TSDFVolume.pyx:166-251),
  * tsdf.MulticlassTSDFVolume.fuse -- label-probability voting
    (TSDFVolume.pyx:348-442),
  * libfusioncpu/libfusiongpu -- the same math over batched views for
    watertight-mesh generation (deps/mesh-fusion/libfusioncpu/fusion.cpp:11-45,
    deps/mesh-fusion/libfusiongpu/fusion.cu:8-57).

The triple voxel loop becomes one vectorised map over the voxel grid: every
voxel center is projected into the depth map with a single 3x4 matmul, and
the truncated-running-average update is a masked elementwise expression. XLA
tiles this onto the VPU; the projection matmul runs on the MXU.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

__all__ = ["fuse_frame", "fuse_frame_multiclass", "tsdf_from_depth_views"]


def _voxel_centers_camera_projection(shape, origin, resolution, proj_matrix):
    """Project all voxel centers with a 3x4 world->image projection matrix.

    Returns (u, v, z_cam) each of shape ``shape``. ``proj_matrix`` rows are
    [K | 0] @ world->camera, i.e. the reference's depth_proj_matrix
    (TSDFVolume.pyx:191-208).
    """
    xs, ys, zs = shape
    ix = jax.lax.broadcasted_iota(jnp.float32, shape, 0)
    iy = jax.lax.broadcasted_iota(jnp.float32, shape, 1)
    iz = jax.lax.broadcasted_iota(jnp.float32, shape, 2)
    x = origin[0] + ix * resolution
    y = origin[1] + iy * resolution
    z = origin[2] + iz * resolution

    p = proj_matrix.astype(jnp.float32)
    px = p[0, 0] * x + p[0, 1] * y + p[0, 2] * z + p[0, 3]
    py = p[1, 0] * x + p[1, 1] * y + p[1, 2] * z + p[1, 3]
    pz = p[2, 0] * x + p[2, 1] * y + p[2, 2] * z + p[2, 3]
    return px, py, pz


def fuse_frame(tsdf_volume: jnp.ndarray, weights_volume: jnp.ndarray,
               depth_map: jnp.ndarray, proj_matrix: jnp.ndarray,
               origin: jnp.ndarray, resolution,
               truncation, weight_map: jnp.ndarray | None = None):
    """Fuse one depth frame into (tsdf, weights) volumes.

    Mirrors reference TSDFVolume.fuse semantics (TSDFVolume.pyx:183-251):
    voxels behind the camera, outside the image, or with invalid depth are
    skipped; voxels with |sdf| <= truncation get the weighted running
    average; voxels farther in front are left untouched (the reference's
    free-space vote channel is tracked separately by callers that need it).

    Args:
      tsdf_volume / weights_volume: (xs, ys, zs) f32 (donated).
      depth_map: (h, w) measured depth.
      proj_matrix: (3, 4) world->image projection ([K|0] @ world2cam).
      origin: (3,) world position of voxel (0,0,0).
      resolution: voxel size.
      truncation: truncation band in meters.
      weight_map: optional (h, w) per-pixel confidence (default 1).
    """
    h, w = depth_map.shape
    shape = tsdf_volume.shape
    px, py, pz = _voxel_centers_camera_projection(shape, origin, resolution,
                                                  proj_matrix)
    in_front = pz > 0
    safe_z = jnp.where(in_front, pz, 1.0)
    u = jnp.round(px / safe_z).astype(jnp.int32)
    v = jnp.round(py / safe_z).astype(jnp.int32)
    in_image = (u >= 0) & (u < w) & (v >= 0) & (v < h)
    uc = jnp.clip(u, 0, w - 1)
    vc = jnp.clip(v, 0, h - 1)

    lin = vc * w + uc
    depth = jnp.take(depth_map.reshape(-1), lin)
    if weight_map is None:
        wpix = jnp.ones_like(depth)
    else:
        wpix = jnp.take(weight_map.reshape(-1), lin)

    valid = in_front & in_image & (depth != 0.0)
    sdf = depth - pz
    in_band = valid & (jnp.abs(sdf) <= truncation)

    w_old = weights_volume
    v_old = tsdf_volume
    w_add = jnp.where(in_band, wpix, 0.0)
    new_w = w_old + w_add
    new_v = jnp.where(in_band,
                      (w_old * v_old + w_add * sdf)
                      / jnp.maximum(new_w, 1e-12),
                      v_old)
    return new_v, new_w


def fuse_frame_multiclass(tsdf_volume, weights_volume, label_probs_volume,
                          depth_map, label_map, proj_matrix, origin,
                          resolution, truncation, n_classes: int = 0):
    """Multiclass variant: additionally vote per-voxel label probabilities
    (reference MulticlassTSDFVolume.fuse, TSDFVolume.pyx:348-442).

    ``label_probs_volume`` is (xs, ys, zs, C); the in-band voxels accumulate
    a one-hot vote for the label observed at their projection.
    """
    h, w = depth_map.shape
    shape = tsdf_volume.shape
    px, py, pz = _voxel_centers_camera_projection(shape, origin, resolution,
                                                  proj_matrix)
    in_front = pz > 0
    safe_z = jnp.where(in_front, pz, 1.0)
    u = jnp.round(px / safe_z).astype(jnp.int32)
    v = jnp.round(py / safe_z).astype(jnp.int32)
    in_image = (u >= 0) & (u < w) & (v >= 0) & (v < h)
    uc = jnp.clip(u, 0, w - 1)
    vc = jnp.clip(v, 0, h - 1)
    lin = vc * w + uc
    depth = jnp.take(depth_map.reshape(-1), lin)
    label = jnp.take(label_map.reshape(-1), lin)

    valid = in_front & in_image & (depth != 0.0)
    sdf = depth - pz
    in_band = valid & (jnp.abs(sdf) <= truncation)

    w_old = weights_volume
    w_add = jnp.where(in_band, 1.0, 0.0)
    new_w = w_old + w_add
    new_v = jnp.where(in_band,
                      (w_old * tsdf_volume + w_add * sdf)
                      / jnp.maximum(new_w, 1e-12),
                      tsdf_volume)

    c = label_probs_volume.shape[-1]
    onehot = jax.nn.one_hot(label.astype(jnp.int32), c, dtype=jnp.float32)
    vote = onehot * w_add[..., None]
    new_probs = label_probs_volume + vote
    return new_v, new_w, new_probs


# jitted entry points with donated volume buffers (in-place HBM update);
# the plain functions above stay traceable inside scan/vmap.
fuse_frame_jit = jax.jit(fuse_frame, donate_argnums=(0, 1))
fuse_frame_multiclass_jit = jax.jit(fuse_frame_multiclass,
                                    donate_argnums=(0, 1, 2))


def tsdf_from_depth_views(depth_maps, proj_matrices, shape, origin,
                          resolution, truncation, init_value=None):
    """Batch multi-view TSDF fusion (the libfusion{cpu,gpu} use case,
    deps/mesh-fusion/libfusioncpu/fusion.cpp:11-45): fold ``fuse_frame``
    over views with a ``lax.scan`` so the whole fusion is one XLA program.
    """
    if init_value is None:
        init_value = truncation
    tsdf0 = jnp.full(shape, float(init_value), jnp.float32)
    w0 = jnp.zeros(shape, jnp.float32)

    def body(carry, inputs):
        tsdf, wvol = carry
        depth, proj = inputs
        tsdf, wvol = fuse_frame(tsdf, wvol, depth, proj,
                                jnp.asarray(origin, jnp.float32),
                                jnp.float32(resolution),
                                jnp.float32(truncation))
        return (tsdf, wvol), None

    (tsdf, wvol), _ = jax.lax.scan(
        body, (tsdf0, w0),
        (jnp.asarray(depth_maps, jnp.float32),
         jnp.asarray(proj_matrices, jnp.float32)))
    return tsdf, wvol
