"""Volume integration: deterministic scatter updates of the scene volumes.

TPU-native re-design of the reference integrator (reference
modules/integrator.py:15-126). The reference accumulates duplicate voxel
contributions with two ``index_add_`` passes, re-gathers the sums at the
contributing indices and writes back a running weighted average; the semantic
volume is updated winner-takes-max-score with racy duplicate writes.

Here the same math is expressed as volume-level scatter ops with static
shapes:

  * TSDF / weights:  dw  = scatter_add(trilinear_weight)
                     dnum = scatter_add(trilinear_weight * tsdf_update)
                     w'  = w + dw
                     v'  = (w * v + dnum) / w'   where dw > 0, else v
    -- identical to reference modules/integrator.py:55-88 (which computes the
    same average only at touched voxels).

  * semantics: the (score, id) pair is packed into a single monotonic int32
    key (score quantised to 23 bits, id in the low 8 bits) and combined with
    a single deterministic ``scatter_max`` -- equivalent to the reference's
    "update where score > score_old" rule (modules/integrator.py:110-124) but
    race-free: among duplicate updates to one voxel the highest score wins
    deterministically.

Invalid corners / invalid pixels are handled by clamping their index and
forcing their scatter weight (or packed key) to 0, which makes them no-ops --
the static-shape equivalent of the reference's masked_select filtering
(modules/integrator.py:48-53).
"""

from __future__ import annotations

import functools
from typing import NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp

from .geometry import clamp_indices, valid_index_mask, _flatten_index

__all__ = [
    "integrate_tsdf",
    "integrate_semantics",
    "integrate_numw",
    "integrate_semkey",
    "integrate_frame",
    "pack_semantic_key",
    "unpack_semantic_key",
]

_SCORE_BITS = 23
_SCORE_SCALE = float((1 << _SCORE_BITS) - 1)  # scores are softmax probs in [0,1]


def pack_semantic_key(scores: jnp.ndarray, ids: jnp.ndarray) -> jnp.ndarray:
    """Pack (score in [0,1], id in [0,255]) into one monotonic int32 key.

    Ordering by key == ordering by (score, id); ties on score break toward
    the larger id (the reference's duplicate writes are racy, see
    modules/integrator.py:113-124 -- this is the deterministic replacement).
    """
    q = jnp.clip(jnp.round(scores.astype(jnp.float32) * _SCORE_SCALE),
                 0.0, _SCORE_SCALE).astype(jnp.int32)
    return q * 256 + ids.astype(jnp.int32)


def unpack_semantic_key(key: jnp.ndarray) -> Tuple[jnp.ndarray, jnp.ndarray]:
    ids = (key % 256).astype(jnp.uint8)
    scores = (key // 256).astype(jnp.float32) / _SCORE_SCALE
    return scores, ids


def integrate_tsdf(tsdf_volume: jnp.ndarray, weights_volume: jnp.ndarray,
                   values: jnp.ndarray, indices: jnp.ndarray,
                   weights: jnp.ndarray,
                   mask: Optional[jnp.ndarray] = None):
    """Scatter per-ray TSDF updates into the global volumes.

    Args:
      tsdf_volume: (xs, ys, zs) current TSDF.
      weights_volume: (xs, ys, zs) current fusion weights.
      values: (n, p) predicted TSDF updates (already clamped by caller,
        reference modules/pipeline.py:154-156).
      indices: (n, p, 8, 3) int32 corner indices (possibly out of bounds).
      weights: (n, p, 8) trilinear corner weights.
      mask: optional (n,) bool of valid rays (depth != 0,
        reference modules/pipeline.py:145-153).

    Returns:
      (new_tsdf, new_weights), both float32, same shapes as inputs.
    """
    shape = tsdf_volume.shape
    valid = valid_index_mask(indices, shape)                  # (n, p, 8)
    if mask is not None:
        valid = valid & mask[:, None, None]
    w = jnp.where(valid, weights.astype(jnp.float32), 0.0)
    safe = clamp_indices(indices, shape)
    lin = _flatten_index(safe, shape).reshape(-1)             # (n*p*8,)
    w_flat = w.reshape(-1)
    wv_flat = (w * values.astype(jnp.float32)[:, :, None]).reshape(-1)

    nvox = shape[0] * shape[1] * shape[2]
    dw = jnp.zeros((nvox,), jnp.float32).at[lin].add(
        w_flat, mode="drop").reshape(shape)
    dnum = jnp.zeros((nvox,), jnp.float32).at[lin].add(
        wv_flat, mode="drop").reshape(shape)

    w_old = weights_volume.astype(jnp.float32)
    v_old = tsdf_volume.astype(jnp.float32)
    new_w = w_old + dw
    touched = dw > 0
    new_v = jnp.where(touched, (w_old * v_old + dnum)
                      / jnp.maximum(new_w, 1e-12), v_old)
    return new_v, new_w


def integrate_semantics(semantics_volume: jnp.ndarray,
                        scores_volume: jnp.ndarray,
                        ids: jnp.ndarray, scores: jnp.ndarray,
                        indices: jnp.ndarray,
                        mask: Optional[jnp.ndarray] = None):
    """Winner-takes-max-score semantic label update.

    Reference semantics (modules/integrator.py:90-124): each ray writes its
    per-pixel (id, score) to all 8 corners of its first n_tail sample points;
    a voxel keeps whichever label has the highest score seen so far.

    Args:
      semantics_volume: (xs, ys, zs) uint8 label volume.
      scores_volume: (xs, ys, zs) float score volume.
      ids: (n,) or (n, p) uint8 per-ray labels (per-pixel labels are
        broadcast over sample points by the caller).
      scores: same shape as ids, float scores in [0, 1].
      indices: (n, p, 8, 3) int32 corner indices.
      mask: optional (n,) bool valid-ray mask.

    Returns:
      (new_semantics uint8, new_scores float32).
    """
    shape = semantics_volume.shape
    n, p = indices.shape[0], indices.shape[1]
    if ids.ndim == 1:
        ids = jnp.broadcast_to(ids[:, None], (n, p))
        scores = jnp.broadcast_to(scores[:, None], (n, p))

    valid = valid_index_mask(indices, shape)                  # (n, p, 8)
    if mask is not None:
        valid = valid & mask[:, None, None]

    key_new = pack_semantic_key(scores, ids)                  # (n, p)
    key_new = jnp.broadcast_to(key_new[:, :, None], (n, p, 8))
    key_new = jnp.where(valid, key_new, 0)

    safe = clamp_indices(indices, shape)
    lin = _flatten_index(safe, shape).reshape(-1)

    key_old = pack_semantic_key(scores_volume.astype(jnp.float32),
                                semantics_volume)
    key = key_old.reshape(-1).at[lin].max(key_new.reshape(-1),
                                          mode="drop").reshape(shape)
    new_scores, new_ids = unpack_semantic_key(key)
    return new_ids, new_scores


def integrate_numw(num_volume: jnp.ndarray, w_volume: jnp.ndarray,
                   values: jnp.ndarray, indices: jnp.ndarray,
                   weights: jnp.ndarray,
                   mask: Optional[jnp.ndarray] = None):
    """Accumulator-form TSDF integration: the scene state stores
    (num = sum w*v, w = sum w) instead of (tsdf, w), so the running
    weighted average v' = (w*v + dnum) / (w + dw) of the reference
    (modules/integrator.py:77-88) reduces to two pure scatter-adds into the
    donated state -- no zero-volume allocation, no full-volume combine
    passes, no old-value re-gather. ``tsdf = num / w`` is materialised only
    at read boundaries (extraction gathers, evaluation, saving).

    Args/shapes as :func:`integrate_tsdf`. Returns (new_num, new_w).
    """
    shape = num_volume.shape
    valid = valid_index_mask(indices, shape)
    if mask is not None:
        valid = valid & mask[:, None, None]
    w = jnp.where(valid, weights.astype(jnp.float32), 0.0)
    safe = clamp_indices(indices, shape)
    lin = _flatten_index(safe, shape).reshape(-1)
    w_flat = w.reshape(-1)
    wv_flat = (w * values.astype(jnp.float32)[:, :, None]).reshape(-1)
    new_w = w_volume.reshape(-1).at[lin].add(w_flat).reshape(shape)
    new_num = num_volume.reshape(-1).at[lin].add(wv_flat).reshape(shape)
    return new_num, new_w


def integrate_semkey(semkey_volume: jnp.ndarray, ids: jnp.ndarray,
                     scores: jnp.ndarray, indices: jnp.ndarray,
                     mask: Optional[jnp.ndarray] = None) -> jnp.ndarray:
    """Packed-key form of :func:`integrate_semantics`: the scene state
    stores the monotonic (score, id) int32 key itself, so the
    winner-takes-max update is ONE in-place scatter-max -- the pack/unpack
    full-volume passes happen only at read boundaries."""
    shape = semkey_volume.shape
    n, p = indices.shape[0], indices.shape[1]
    if ids.ndim == 1:
        ids = jnp.broadcast_to(ids[:, None], (n, p))
        scores = jnp.broadcast_to(scores[:, None], (n, p))
    valid = valid_index_mask(indices, shape)
    if mask is not None:
        valid = valid & mask[:, None, None]
    key_new = pack_semantic_key(scores, ids)
    key_new = jnp.broadcast_to(key_new[:, :, None], (n, p, 8))
    key_new = jnp.where(valid, key_new, 0)
    safe = clamp_indices(indices, shape)
    lin = _flatten_index(safe, shape).reshape(-1)
    return semkey_volume.reshape(-1).at[lin].max(
        key_new.reshape(-1)).reshape(shape)


class IntegrationResult(NamedTuple):
    tsdf: jnp.ndarray
    weights: jnp.ndarray
    semantics: Optional[jnp.ndarray]
    scores: Optional[jnp.ndarray]


@functools.partial(jax.jit, static_argnames=("update_semantics",),
                   donate_argnums=(0, 1, 2, 3))
def integrate_frame(tsdf_volume, weights_volume, semantics_volume, scores_volume,
              values, indices, weights, mask=None, ids=None, scores=None,
              update_semantics: bool = False) -> IntegrationResult:
    """Full integration step (reference Integrator.forward,
    modules/integrator.py:15-126). Volume buffers are donated -- the update
    happens in-place in HBM."""
    new_tsdf, new_w = integrate_tsdf(tsdf_volume, weights_volume, values,
                                     indices, weights, mask)
    if update_semantics:
        new_ids, new_scores = integrate_semantics(
            semantics_volume, scores_volume, ids, scores, indices, mask)
    else:
        new_ids, new_scores = semantics_volume, scores_volume
    return IntegrationResult(new_tsdf, new_w, new_ids, new_scores)


def integrate_numw_lin(num_volume: jnp.ndarray, w_volume: jnp.ndarray,
                       values: jnp.ndarray, lin: jnp.ndarray,
                       valid: jnp.ndarray, weights: jnp.ndarray,
                       mask: Optional[jnp.ndarray] = None):
    """:func:`integrate_numw` taking pre-linearised clamped corner indices +
    validity from the factored extraction path
    (geometry.interpolation_corners_factored) -- no (n, p, 8, 3) index
    re-derivation."""
    shape = num_volume.shape
    if mask is not None:
        valid = valid & mask[:, None, None]
    w = jnp.where(valid, weights.astype(jnp.float32), 0.0)
    lin_flat = lin.reshape(-1)
    w_flat = w.reshape(-1)
    wv_flat = (w * values.astype(jnp.float32)[:, :, None]).reshape(-1)
    new_w = w_volume.reshape(-1).at[lin_flat].add(w_flat).reshape(shape)
    new_num = num_volume.reshape(-1).at[lin_flat].add(wv_flat).reshape(shape)
    return new_num, new_w


def integrate_semkey_lin(semkey_volume: jnp.ndarray, ids: jnp.ndarray,
                         scores: jnp.ndarray, lin: jnp.ndarray,
                         valid: jnp.ndarray,
                         mask: Optional[jnp.ndarray] = None) -> jnp.ndarray:
    """:func:`integrate_semkey` over pre-linearised corner indices."""
    shape = semkey_volume.shape
    n, p = lin.shape[0], lin.shape[1]
    if ids.ndim == 1:
        ids = jnp.broadcast_to(ids[:, None], (n, p))
        scores = jnp.broadcast_to(scores[:, None], (n, p))
    if mask is not None:
        valid = valid & mask[:, None, None]
    key_new = pack_semantic_key(scores, ids)
    key_new = jnp.broadcast_to(key_new[:, :, None], (n, p, 8))
    key_new = jnp.where(valid, key_new, 0)
    return semkey_volume.reshape(-1).at[lin.reshape(-1)].max(
        key_new.reshape(-1)).reshape(shape)
