"""Depth rendering by ray marching a TSDF/occupancy volume.

TPU-native replacement for the reference's per-pixel DDA ray marchers
(reference deps/tsdf/src/tsdf/TSDFVolume.pyx:444-506 ``depth_rendering`` and
:594-710 ``trace_ray``; duplicated in deps/graphics/src/graphics/renderer/
raycasting.pyx:8-306). Instead of a data-dependent while-loop per pixel, all
rays march a fixed number of uniform steps in lockstep (one (h*w, n_steps)
vectorised map -- XLA-friendly, no dynamic shapes) and the surface is located
by the first TSDF sign change, refined by linear interpolation between the
two bracketing samples.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

from .geometry import unproject, clamp_indices, valid_index_mask, _flatten_index

__all__ = ["render_depth"]


def _sample_volume_nearest(volume, points_v, fill):
    idx = jnp.round(points_v).astype(jnp.int32)
    valid = valid_index_mask(idx, volume.shape)
    safe = clamp_indices(idx, volume.shape)
    lin = _flatten_index(safe, volume.shape)
    vals = jnp.take(volume.reshape(-1), lin)
    return jnp.where(valid, vals, fill), valid


@functools.partial(jax.jit, static_argnames=("height", "width", "n_steps"))
def render_depth(tsdf_volume: jnp.ndarray, extrinsics: jnp.ndarray,
                 intrinsics: jnp.ndarray, origin: jnp.ndarray,
                 resolution, height: int, width: int,
                 near: float = 0.1, far: float = 8.0,
                 n_steps: int = 384) -> jnp.ndarray:
    """Render a depth map from a TSDF volume.

    Args:
      tsdf_volume: (xs, ys, zs) signed distances (negative = inside).
      extrinsics: (4, 4) camera-to-world matrix.
      intrinsics: (3, 3) intrinsics.
      origin: (3,) world position of voxel (0, 0, 0).
      resolution: voxel size (meters).
      height/width: output resolution.
      near/far: march range in meters.
      n_steps: uniform samples per ray.

    Returns:
      (height, width) depth map; 0 where no surface was hit.
    """
    # unit ray directions in world space via a depth-1 unprojection
    ones = jnp.ones((height, width), jnp.float32)
    pts1 = unproject(ones, extrinsics, intrinsics)          # (h*w, 3)
    eye = extrinsics[:3, 3].astype(jnp.float32)
    dirs = pts1 - eye[None, :]
    # NOTE: marching in *ray parameter* t such that point = eye + t * dirs
    # means t equals the pinhole depth (z in camera space), matching how the
    # datasets store depth (z-depth, not euclidean range).
    ts = jnp.linspace(near, far, n_steps).astype(jnp.float32)  # (s,)

    def sample_at(t):
        pw = eye[None, :] + t * dirs                         # (h*w, 3)
        pv = (pw - origin[None, :]) / resolution
        vals, valid = _sample_volume_nearest(tsdf_volume, pv, jnp.inf)
        return vals, valid

    def body(carry, t):
        prev_val, prev_t, hit_t = carry
        val, valid = sample_at(t)
        # sign change prev >= 0 > current, both samples in bounds
        crossing = (prev_val > 0) & (val <= 0) & valid & jnp.isfinite(prev_val)
        # linear zero-crossing between prev_t and t
        denom = prev_val - val
        frac = jnp.where(jnp.abs(denom) > 1e-12, prev_val / denom, 0.0)
        t_surf = prev_t + frac * (t - prev_t)
        new_hit = jnp.where((hit_t == 0.0) & crossing, t_surf, hit_t)
        return (val, jnp.full_like(prev_t, t), new_hit), None

    val0, _ = sample_at(ts[0])
    init = (val0, jnp.full((height * width,), ts[0], jnp.float32),
            jnp.zeros((height * width,), jnp.float32))
    (_, _, hit_t), _ = jax.lax.scan(body, init, ts[1:])
    return hit_t.reshape(height, width)
