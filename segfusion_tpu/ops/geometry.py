"""Core geometry ops: unprojection, ray sampling, trilinear extraction.

TPU-native re-design of the reference extractor (reference
modules/extractor.py:24-79, :82-120, :309-345, :533-593, :640-681). All ops
are pure functions over static shapes: instead of boolean-indexing valid
pixels (dynamic shapes break XLA), every ray is kept and invalid lanes are
masked (out-of-bounds corners read a constant fill value with weight 0 --
numerically identical to the reference's container scheme at
modules/extractor.py:663-667).

Conventions (matching the reference):
  * depth maps are (h, w); pixel grid u = column, v = row; camera-space point
    for pixel (v, u) with depth d is K^-1 @ [u*d, v*d, d]
    (reference modules/extractor.py:96-114).
  * ``extrinsics`` is the 4x4 camera-to-world matrix: world point =
    extrinsics[:3] @ [X_c; 1] (reference modules/extractor.py:116).
  * volumes are indexed [x, y, z]; voxel coordinates are
    (world - origin) / resolution (reference modules/extractor.py:314).
"""

from __future__ import annotations

import functools
from typing import NamedTuple, Optional

import jax
import jax.numpy as jnp

__all__ = [
    "unproject",
    "sample_ray_points",
    "interpolation_weights",
    "trilinear_gather",
    "trilinear_gather_numw",
    "extract",
    "extract_numw",
    "ExtractedValues",
]

INVALID_TSDF_FILL = -0.1  # value read for out-of-bounds corners
                          # (reference modules/extractor.py:663)


def unproject(depth: jnp.ndarray, extrinsics: jnp.ndarray,
              intrinsics: jnp.ndarray) -> jnp.ndarray:
    """Back-project a depth map to world-space points.

    Args:
      depth: (h, w) depth map.
      extrinsics: (4, 4) camera-to-world matrix.
      intrinsics: (3, 3) pinhole intrinsics.

    Returns:
      (h*w, 3) world points. Reference modules/extractor.py:82-120.
    """
    h, w = depth.shape
    v = jax.lax.broadcasted_iota(jnp.float32, (h, w), 0)  # row index
    u = jax.lax.broadcasted_iota(jnp.float32, (h, w), 1)  # col index
    d = depth.astype(jnp.float32)
    # pixel-space homogeneous points scaled by depth: [u*d, v*d, d]
    pts_p = jnp.stack([u * d, v * d, d], axis=-1).reshape(h * w, 3)
    k_inv = jnp.linalg.inv(intrinsics.astype(jnp.float32))
    # coordinate math must be exact f32: keep these tiny matmuls off the
    # bf16 MXU path (HIGHEST = f32 accumulation on TPU)
    hi = jax.lax.Precision.HIGHEST
    pts_c = jnp.dot(pts_p, k_inv.T, precision=hi)             # camera space
    rot = extrinsics[:3, :3].astype(jnp.float32)
    trans = extrinsics[:3, 3].astype(jnp.float32)
    return jnp.dot(pts_c, rot.T, precision=hi) + trans        # world space


def sample_ray_points(points_w: jnp.ndarray, eye_w: jnp.ndarray,
                      origin: jnp.ndarray, resolution,
                      n_points: int, bin_size: float = 1.0):
    """Sample ``n_points`` voxel-space positions along each viewing ray,
    centred at the measured surface point.

    The samples are ordered front-to-back: [c - k*dir, ..., c, ..., c + k*dir]
    with k = (n_points - 1) // 2 and dir the unit eye->surface direction in
    voxel space (reference modules/extractor.py:309-345; ordering via
    list.insert(0)/append). The first ``n_tail_points`` of this ordering are
    the ones integrated (reference modules/pipeline.py:150-153), i.e. the
    sampling is biased toward free space in front of the surface.

    Args:
      points_w: (n, 3) world-space surface points.
      eye_w: (3,) world-space camera centre.
      origin: (3,) world coordinates of voxel (0,0,0).
      resolution: scalar voxel size.
      n_points: odd number of samples per ray.

    Returns:
      points_v: (n, n_points, 3) voxel-space sample positions.
      dists: (n, n_points) signed sample offsets in voxels.
    """
    k = (n_points - 1) // 2
    center_v = (points_w - origin[None, :]) / resolution
    eye_v = (eye_w[None, :] - origin[None, :]) / resolution
    direction = center_v - eye_v
    norm = jnp.linalg.norm(direction, axis=-1, keepdims=True)
    direction = direction / jnp.maximum(norm, 1e-12)

    offsets = (jnp.arange(-k, k + 1, dtype=jnp.float32) * bin_size)  # (n_points,)
    points_v = center_v[:, None, :] + offsets[None, :, None] * direction[:, None, :]
    dists = jnp.broadcast_to(offsets[None, :], (points_w.shape[0], n_points))
    return points_v, dists


def interpolation_weights(points_v: jnp.ndarray):
    """8-corner interpolation indices + weights, reference scheme.

    The reference interpolates between the *containing* voxel ``idx`` and its
    neighbour in the direction of ``sign(voxel_center - p)`` per axis, with
    weight ``alpha = |p - (idx + 0.5)|`` on the neighbour (reference
    modules/extractor.py:533-593, mode='center'). Corner enumeration order is
    (i, j, k) in {0,1}^3 with i outermost -- preserved here so that scatter
    behaviour matches the reference exactly.

    Args:
      points_v: (..., 3) voxel-space positions.

    Returns:
      indices: (..., 8, 3) int32 corner indices (may be out of bounds).
      weights: (..., 8) float32 trilinear weights (sum to 1 when neighbor!=0).
    """
    idx = jnp.floor(points_v)
    center = idx + 0.5
    neighbor = jnp.sign(center - points_v)
    alpha = jnp.abs(points_v - center)        # in [0, 0.5]
    alpha_inv = 1.0 - alpha

    corners = []
    weights = []
    for i in (0, 1):
        wi = alpha_inv[..., 0] if i == 0 else alpha[..., 0]
        xi = idx[..., 0] if i == 0 else idx[..., 0] + neighbor[..., 0]
        for j in (0, 1):
            wj = alpha_inv[..., 1] if j == 0 else alpha[..., 1]
            yj = idx[..., 1] if j == 0 else idx[..., 1] + neighbor[..., 1]
            for k in (0, 1):
                wk = alpha_inv[..., 2] if k == 0 else alpha[..., 2]
                zk = idx[..., 2] if k == 0 else idx[..., 2] + neighbor[..., 2]
                weights.append(wi * wj * wk)
                corners.append(jnp.stack([xi, yj, zk], axis=-1))

    indices = jnp.stack(corners, axis=-2).astype(jnp.int32)  # (..., 8, 3)
    w = jnp.stack(weights, axis=-1).astype(jnp.float32)      # (..., 8)
    return indices, w


def _flatten_index(indices: jnp.ndarray, shape) -> jnp.ndarray:
    """Linearise (..., 3) int indices into a flat volume index
    ``ys*zs*x + zs*y + z`` (reference modules/integrator.py:57)."""
    xs, ys, zs = shape
    return (indices[..., 0] * (ys * zs) + indices[..., 1] * zs
            + indices[..., 2])


def valid_index_mask(indices: jnp.ndarray, shape) -> jnp.ndarray:
    """Per-corner in-bounds mask (reference modules/extractor.py:596-607)."""
    xs, ys, zs = shape
    return ((indices[..., 0] >= 0) & (indices[..., 0] < xs)
            & (indices[..., 1] >= 0) & (indices[..., 1] < ys)
            & (indices[..., 2] >= 0) & (indices[..., 2] < zs))


def clamp_indices(indices: jnp.ndarray, shape) -> jnp.ndarray:
    xs, ys, zs = shape
    hi = jnp.array([xs - 1, ys - 1, zs - 1], dtype=indices.dtype)
    return jnp.clip(indices, 0, hi)


def trilinear_gather(points_v: jnp.ndarray, tsdf_volume: jnp.ndarray,
                     weights_volume: jnp.ndarray,
                     fill_value: float = INVALID_TSDF_FILL):
    """Trilinearly sample TSDF + fusion-weight volumes at voxel-space points.

    Out-of-bounds corners read ``fill_value`` for the TSDF and 0 for the
    weights, then enter the weighted sum -- numerically identical to the
    reference's container scheme (modules/extractor.py:640-681).

    Args:
      points_v: (n, p, 3) voxel-space sample points.
      tsdf_volume: (xs, ys, zs) TSDF values.
      weights_volume: (xs, ys, zs) fusion weights.

    Returns:
      fusion_values: (n, p) interpolated TSDF.
      fusion_weights: (n, p) interpolated fusion weights.
      indices: (n, p, 8, 3) int32 corner indices (unclamped).
      weights: (n, p, 8) trilinear corner weights.
    """
    shape = tsdf_volume.shape
    indices, weights = interpolation_weights(points_v)
    valid = valid_index_mask(indices, shape)
    safe = clamp_indices(indices, shape)
    lin = _flatten_index(safe, shape)

    tsdf_flat = tsdf_volume.reshape(-1)
    wvol_flat = weights_volume.reshape(-1)
    tsdf_corner = jnp.where(valid, jnp.take(tsdf_flat, lin, axis=0),
                            jnp.float32(fill_value))
    w_corner = jnp.where(valid, jnp.take(wvol_flat, lin, axis=0), 0.0)

    fusion_values = jnp.sum(tsdf_corner.astype(jnp.float32) * weights, axis=-1)
    fusion_weights = jnp.sum(w_corner.astype(jnp.float32) * weights, axis=-1)
    return fusion_values, fusion_weights, indices, weights


def trilinear_gather_numw(points_v: jnp.ndarray, num_volume: jnp.ndarray,
                          weights_volume: jnp.ndarray, init_value: float,
                          fill_value: float = INVALID_TSDF_FILL):
    """Trilinear sampling from the accumulator state (num = sum w*v,
    w = sum w; see core.volume.SceneVolume). Per corner the TSDF value is
    materialised in-register as ``num/w`` (``init_value`` where unobserved,
    ``fill_value`` out of bounds) -- numerically identical to gathering the
    reference's explicit value volume (modules/extractor.py:640-681) while
    the state itself never stores it.
    """
    shape = num_volume.shape
    indices, weights = interpolation_weights(points_v)
    valid = valid_index_mask(indices, shape)
    safe = clamp_indices(indices, shape)
    lin = _flatten_index(safe, shape)

    num_corner = jnp.take(num_volume.reshape(-1), lin, axis=0)
    w_corner = jnp.take(weights_volume.reshape(-1), lin, axis=0)
    v_corner = jnp.where(w_corner > 0,
                         num_corner / jnp.maximum(w_corner, 1e-12),
                         jnp.float32(init_value))
    v_corner = jnp.where(valid, v_corner, jnp.float32(fill_value))
    w_corner = jnp.where(valid, w_corner, 0.0)

    fusion_values = jnp.sum(v_corner * weights, axis=-1)
    fusion_weights = jnp.sum(w_corner * weights, axis=-1)
    return fusion_values, fusion_weights, indices, weights


def interpolation_corners_factored(points_v: jnp.ndarray, shape):
    """Axis-factored corner computation: identical math to
    :func:`interpolation_weights` + mask + linearisation, but built from
    per-axis components (2 candidates per axis) so no (n, 8, 3) index
    tensors or 24-way bounds checks are materialised.

    Returns (lin (..., 8) int32 clamped linear indices, valid (..., 8)
    bool, weights (..., 8) f32) with the reference corner enumeration
    order (i outermost)."""
    xs, ys, zs = shape
    strides = (ys * zs, zs, 1)
    dims = (xs, ys, zs)

    idx = jnp.floor(points_v)
    center = idx + 0.5
    neighbor = jnp.sign(center - points_v)
    alpha = jnp.abs(points_v - center)

    comp_lin = []   # per axis: (c0*stride, c1*stride)
    comp_val = []   # per axis: (valid0, valid1)
    comp_w = []     # per axis: (1-alpha, alpha)
    for a in range(3):
        c0 = idx[..., a]
        c1 = c0 + neighbor[..., a]
        v0 = (c0 >= 0) & (c0 < dims[a])
        v1 = (c1 >= 0) & (c1 < dims[a])
        l0 = jnp.clip(c0, 0, dims[a] - 1).astype(jnp.int32) * strides[a]
        l1 = jnp.clip(c1, 0, dims[a] - 1).astype(jnp.int32) * strides[a]
        comp_lin.append((l0, l1))
        comp_val.append((v0, v1))
        comp_w.append((1.0 - alpha[..., a], alpha[..., a]))

    lins, vals, ws = [], [], []
    for i in (0, 1):
        for j in (0, 1):
            for k in (0, 1):
                lins.append(comp_lin[0][i] + comp_lin[1][j]
                            + comp_lin[2][k])
                vals.append(comp_val[0][i] & comp_val[1][j]
                            & comp_val[2][k])
                ws.append(comp_w[0][i] * comp_w[1][j] * comp_w[2][k])
    return (jnp.stack(lins, axis=-1), jnp.stack(vals, axis=-1),
            jnp.stack(ws, axis=-1).astype(jnp.float32))


def pack16_numw(num: jnp.ndarray, w: jnp.ndarray) -> jnp.ndarray:
    """(num, w) f32 -> one u32 of two bf16 halves (num high, w low).

    bf16 rather than f16: the packed shadow only feeds the fusion nets,
    which run with bfloat16 compute anyway, so the 8-bit mantissa loses
    nothing downstream -- while bf16's f32 exponent range removes the f16
    overflow hazard at fusion weights > 65504 (long trajectories). The
    reference stores its volumes in float16 (modules/database.py:60-76);
    we keep the same 16-bit read budget with a TPU-native type. bf16 is
    also the only 16-bit float Mosaic can convert in a Pallas kernel here
    (ops/pallas/shadow_build.py builds this exact format on-chip).

    PRECONDITION: finite inputs. The add-half bit trick has no NaN guard
    -- a NaN mantissa pattern can carry into the exponent and pack as Inf
    (or, for the all-ones mantissa, wrap to a non-NaN pattern) -- unlike
    a true bf16 convert. Fine for the finite tsdf/weight accumulators fed
    today; do not pack possibly-NaN data."""
    # RTNE at bit 16 via the classic add-half-to-even INTEGER trick, not
    # astype(bfloat16): under --xla_allow_excess_precision (set by this
    # environment's TPU compiler) XLA elides the bf16 down-up round-trip
    # and silently truncates instead of rounding; the integer form is
    # deterministic, bit-identical on CPU/TPU/Pallas, and cheaper.
    nb = jax.lax.bitcast_convert_type(num.astype(jnp.float32), jnp.uint32)
    wb = jax.lax.bitcast_convert_type(w.astype(jnp.float32), jnp.uint32)
    nr = (nb + (jnp.uint32(0x7FFF) + ((nb >> 16) & 1))) \
        & jnp.uint32(0xFFFF0000)
    wr = (wb + (jnp.uint32(0x7FFF) + ((wb >> 16) & 1))) >> 16
    return nr | wr


def unpack16_numw(g: jnp.ndarray):
    """Inverse of :func:`pack16_numw`: u32 -> (num f32, w f32)."""
    num = jax.lax.bitcast_convert_type(
        g & jnp.uint32(0xFFFF0000), jnp.float32)
    w = jax.lax.bitcast_convert_type(g << 16, jnp.float32)
    return num, w


def trilinear_gather_packed16(points_v: jnp.ndarray, num_volume: jnp.ndarray,
                              weights_volume: jnp.ndarray, init_value: float,
                              fill_value: float = INVALID_TSDF_FILL):
    """Half the gather count of :func:`trilinear_gather_numw`: (num, w) are
    packed per voxel into one uint32 (two bf16 halves, see pack16_numw) in
    a single fused full-volume pass (~bandwidth cost of one elementwise
    op), then each corner needs ONE random access instead of two. Random
    scalar access is the measured bottleneck on TPU (PERFORMANCE.md), so
    trading a linear pass for half the gathers wins.
    """
    shape = num_volume.shape
    packed = pack16_numw(num_volume, weights_volume).reshape(-1)

    lin, valid, weights = interpolation_corners_factored(points_v, shape)

    g = jnp.take(packed, lin, axis=0)
    num_c, w_c = unpack16_numw(g)
    v_c = jnp.where(w_c > 0, num_c / jnp.maximum(w_c, 1e-12),
                    jnp.float32(init_value))
    v_c = jnp.where(valid, v_c, jnp.float32(fill_value))
    w_c = jnp.where(valid, w_c, 0.0)

    fusion_values = jnp.sum(v_c * weights, axis=-1)
    fusion_weights = jnp.sum(w_c * weights, axis=-1)
    return fusion_values, fusion_weights, lin, valid, weights


class ExtractedValues(NamedTuple):
    """Per-ray extraction result (reference modules/extractor.py:69-75).

    ``lin``/``valid`` (set by the factored packed16 path) carry the
    clamped linear corner indices + in-bounds mask so the integrator can
    scatter without re-deriving them; ``indices`` carries the (n, p, 8, 3)
    form for the reference-parity surface (None on the fast path).
    """
    fusion_values: jnp.ndarray    # (h*w, n_points)
    fusion_weights: jnp.ndarray   # (h*w, n_points)
    points: jnp.ndarray           # (h*w, n_points, 3) voxel space
    depth: jnp.ndarray            # (h*w,)
    indices: Optional[jnp.ndarray]  # (h*w, n_points, 8, 3) or None
    weights: jnp.ndarray          # (h*w, n_points, 8)
    pcl: jnp.ndarray              # (h*w, 3) world-space surface points
    lin: Optional[jnp.ndarray] = None    # (h*w, n_points, 8) int32
    valid: Optional[jnp.ndarray] = None  # (h*w, n_points, 8) bool


@functools.partial(jax.jit, static_argnames=("n_points",))
def extract(depth: jnp.ndarray, extrinsics: jnp.ndarray,
            intrinsics: jnp.ndarray, tsdf_volume: jnp.ndarray,
            weights_volume: jnp.ndarray, origin: jnp.ndarray,
            resolution, n_points: int = 9) -> ExtractedValues:
    """Full extraction: unproject -> ray sample -> trilinear gather.

    Mirrors reference Extractor.forward (modules/extractor.py:24-79) with
    static shapes; every pixel produces a ray (invalid pixels are masked
    downstream in the integrator, not filtered here).
    """
    h, w = depth.shape
    points_w = unproject(depth, extrinsics, intrinsics)
    eye_w = extrinsics[:3, 3].astype(jnp.float32)
    points_v, _ = sample_ray_points(points_w, eye_w, origin, resolution,
                                    n_points)
    fusion_values, fusion_weights, indices, weights = trilinear_gather(
        points_v, tsdf_volume, weights_volume)
    return ExtractedValues(
        fusion_values=fusion_values,
        fusion_weights=fusion_weights,
        points=points_v,
        depth=depth.reshape(h * w),
        indices=indices,
        weights=weights,
        pcl=points_w,
    )


@functools.partial(jax.jit, static_argnames=("n_points", "init_value",
                                             "packed16"))
def extract_numw(depth: jnp.ndarray, extrinsics: jnp.ndarray,
                 intrinsics: jnp.ndarray, num_volume: jnp.ndarray,
                 weights_volume: jnp.ndarray, origin: jnp.ndarray,
                 resolution, init_value: float,
                 n_points: int = 9, packed16: bool = False
                 ) -> ExtractedValues:
    """:func:`extract` over the accumulator scene state. ``packed16`` halves
    the gather count via the u32-packed bf16 shadow (pack16_numw format;
    see trilinear_gather_packed16)."""
    h, w = depth.shape
    points_w = unproject(depth, extrinsics, intrinsics)
    eye_w = extrinsics[:3, 3].astype(jnp.float32)
    points_v, _ = sample_ray_points(points_w, eye_w, origin, resolution,
                                    n_points)
    if packed16:
        fusion_values, fusion_weights, lin, valid, weights = \
            trilinear_gather_packed16(points_v, num_volume, weights_volume,
                                      init_value)
        return ExtractedValues(
            fusion_values=fusion_values, fusion_weights=fusion_weights,
            points=points_v, depth=depth.reshape(h * w), indices=None,
            weights=weights, pcl=points_w, lin=lin, valid=valid)
    fusion_values, fusion_weights, indices, weights = trilinear_gather_numw(
        points_v, num_volume, weights_volume, init_value)
    return ExtractedValues(
        fusion_values=fusion_values,
        fusion_weights=fusion_weights,
        points=points_v,
        depth=depth.reshape(h * w),
        indices=indices,
        weights=weights,
        pcl=points_w,
    )
