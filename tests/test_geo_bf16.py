"""bf16 geo accumulator state (SETTINGS.geo_dtype: bfloat16).

The geo slot state may be carried in bfloat16 to halve the scatter-add's
fixed full-state pass (PERFORMANCE.md scatter cost model; the reference
itself stores float16 volumes, modules/integrator.py:79-88). Contract:

  (a) entry/exit roundtrip == RTNE bf16 rounding of the canonical state
      (reconcile adds exact zeros; the upcast is exact);
  (b) the Pallas shadow/reconcile kernels stay BIT-EQUAL to the XLA
      formulation on a bf16 state (both upcast at load, f32 math);
  (c) integration on the bf16 state tracks the f32 row path within bf16
      accumulation tolerance (relative ~2^-8 per accumulate);
  (d) the full pipeline sequence path runs under geo_dtype=bfloat16 and
      its fused volume tracks the f32 run.
"""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from segfusion_tpu.config import Config, _DEFAULTS, _merge_defaults
from segfusion_tpu.core.pipeline import Pipeline
from segfusion_tpu.core.volume import init_scene_volume
from segfusion_tpu.ops import geometry, integrate as integ, rowvol
from segfusion_tpu.ops.rowvol import (RowLayout, build_shadow, corner_rows,
                                      integrate_rows, rows_from_volume,
                                      volume_from_rows)

SHAPE = (20, 21, 140)


def _state(rng, shape=SHAPE):
    num = rng.randn(*shape).astype(np.float32)
    w = (rng.rand(*shape) * 3).astype(np.float32)
    w[w < 0.4] = 0.0
    key = (rng.rand(*shape) * (1 << 20)).astype(np.int32)
    return jnp.asarray(num), jnp.asarray(w), jnp.asarray(key)


def test_roundtrip_is_rtne_bf16():
    rng = np.random.RandomState(0)
    num, w, key = _state(rng)
    L = RowLayout.for_shape(SHAPE)
    geo, krows = rows_from_volume(num, w, key, L, geo_dtype=jnp.bfloat16)
    assert geo.dtype == jnp.bfloat16
    num2, w2, key2 = volume_from_rows(geo, krows, L)
    assert num2.dtype == jnp.float32
    np.testing.assert_array_equal(
        np.asarray(num2),
        np.asarray(num.astype(jnp.bfloat16).astype(jnp.float32)))
    np.testing.assert_array_equal(
        np.asarray(w2),
        np.asarray(w.astype(jnp.bfloat16).astype(jnp.float32)))
    np.testing.assert_array_equal(np.asarray(key2), np.asarray(key))


def _reachable_bf16_geo(L, rng):
    """Random slot mass restricted to scatter-reachable lanes (see
    tests/test_shadow_pallas.py), rounded to bf16."""
    geo = rng.randn(L.geo_rows, 128).astype(np.float32) * 0.3
    g5 = geo.reshape(L.X, L.SY, L.G, 8, 16)
    g5[:, 0] = 0.0
    g5[:, L.Y + 1:] = 0.0        # pad row y = Y + align rows
    for c in (2, 3, 6, 7):
        g5[:, L.Y, :, c] = 0.0
    gz, sz = (L.Z - 1) // 16, (L.Z - 1) % 16
    for c in (1, 3, 5, 7):
        g5[:, :, gz, c, sz] = 0.0
    g5[:, :, gz, :, sz + 1:] = 0.0
    g5[:, :, gz + 1:] = 0.0
    return jnp.asarray(g5.reshape(L.geo_rows, 128)).astype(jnp.bfloat16)


@pytest.mark.parametrize("shape", [(24, 24, 160), (6, 8, 40), (5, 8, 12),
                                   (16, 88, 84)])
def test_build_shadow_pallas_bf16_bit_equal(shape):
    from segfusion_tpu.ops.pallas.shadow_build import build_shadow_pallas
    L = RowLayout.for_shape(shape)
    geo = _reachable_bf16_geo(L, np.random.RandomState(1))
    want = jax.jit(build_shadow, static_argnums=(1, 2))(geo, L, "xla")
    got = build_shadow_pallas(geo, L, interpret=True)
    assert np.array_equal(np.asarray(got), np.asarray(want))


@pytest.mark.parametrize("shape", [(24, 24, 160), (5, 8, 12),
                                   (16, 88, 84)])
def test_reconcile_slot_pallas_bf16_bit_equal(shape):
    from segfusion_tpu.ops.pallas.shadow_build import reconcile_slot_pallas
    from segfusion_tpu.ops.rowvol import _reconcile_slot
    L = RowLayout.for_shape(shape)
    geo = _reachable_bf16_geo(L, np.random.RandomState(2))
    want_n, want_w = jax.jit(_reconcile_slot, static_argnums=(1,))(geo, L)
    got_n, got_w = reconcile_slot_pallas(geo, L, interpret=True)
    assert got_n.dtype == jnp.float32
    assert np.array_equal(np.asarray(got_n), np.asarray(want_n))
    assert np.array_equal(np.asarray(got_w), np.asarray(want_w))


def test_bf16_kernels_reject_unaligned_layout():
    """16-bit slab kernels must refuse layouts the Mosaic DMA tiling
    cannot prove aligned (Y with no 8-divisible tile -> TY % 8 != 0)
    instead of failing at lowering time. Database._padded_shape pads Y
    to a multiple of 8, so Database volumes never hit this."""
    from segfusion_tpu.ops.pallas.shadow_build import build_shadow_pallas
    L = RowLayout.for_shape((6, 20, 40))   # Y=20: no 8-divisible divisor
    geo = _reachable_bf16_geo(L, np.random.RandomState(7))
    with pytest.raises(ValueError, match="multiple of 8"):
        build_shadow_pallas(geo, L, interpret=True)


def test_database_pads_y_to_multiple_of_8():
    from segfusion_tpu.core.database import Database

    class _Cfg(dict):
        __getattr__ = dict.get
        init_value = 0.1

    db = Database.__new__(Database)
    db.pad_shape_multiple = 1
    assert db._padded_shape((84, 84, 84)) == (84, 88, 84)
    db.pad_shape_multiple = 8
    assert db._padded_shape((84, 84, 84)) == (88, 88, 88)


def test_dirty_shadow_bf16_bit_equal():
    from segfusion_tpu.ops.pallas.shadow_build import (
        build_shadow_dirty_pallas, build_shadow_pallas)
    L = RowLayout.for_shape((8, 16, 64))
    rng = np.random.RandomState(3)
    geo = _reachable_bf16_geo(L, rng)
    prev = build_shadow_pallas(
        _reachable_bf16_geo(L, np.random.RandomState(4)), L,
        interpret=True)
    _, NJ = rowvol.shadow_tiling(L)
    dirty = np.zeros((L.X * NJ + 1,), np.int32)
    dirty[:-1][rng.rand(L.X * NJ) > 0.5] = 1
    want = rowvol.build_shadow_dirty(geo, prev, jnp.asarray(dirty), L,
                                     impl="xla")
    got = build_shadow_dirty_pallas(geo, prev, jnp.asarray(dirty), L,
                                    interpret=True)
    assert np.array_equal(np.asarray(got), np.asarray(want))


def test_integrate_rows_bf16_tracks_f32():
    rng = np.random.RandomState(5)
    num, w, key = _state(rng)
    L = RowLayout.for_shape(SHAPE)
    n, p, t = 64, 5, 4
    pts = jnp.asarray(
        rng.rand(n, p, 3).astype(np.float32) * (np.asarray(SHAPE) - 1))
    values = jnp.asarray(rng.randn(n, t).astype(np.float32) * 0.1)
    ids = jnp.asarray(rng.randint(1, 9, n).astype(np.uint8))
    scores = jnp.asarray(rng.rand(n).astype(np.float32))
    sem_key = integ.pack_semantic_key(scores, ids)
    cr = corner_rows(pts, L)

    outs = {}
    for dt in (jnp.float32, jnp.bfloat16):
        geo, krows = rows_from_volume(num, w, key, L, geo_dtype=dt)
        new_geo, new_key = integrate_rows(geo, krows, cr, values, sem_key,
                                          None, n_tail=t)
        assert new_geo.dtype == dt
        outs[dt] = volume_from_rows(new_geo, new_key, L)

    nf, wf, kf = outs[jnp.float32]
    nb, wb, kb = outs[jnp.bfloat16]
    # keys are integer winner-takes-max: unaffected by the geo dtype
    np.testing.assert_array_equal(np.asarray(kb), np.asarray(kf))
    # bf16 accumulation: ~2^-8 relative per add; states are O(1)
    np.testing.assert_allclose(np.asarray(nb), np.asarray(nf),
                               atol=0.05, rtol=0.02)
    np.testing.assert_allclose(np.asarray(wb), np.asarray(wf),
                               atol=0.05, rtol=0.02)


def test_early_cast_build_is_bit_identical():
    """EARLY_CAST (bf16 vals8 before the placement-only select tree)
    must produce bit-identical states to the f32 build + astype-at-
    scatter path (rowvol._geo_scatter)."""
    rng = np.random.RandomState(11)
    num, w, key = _state(rng)
    L = RowLayout.for_shape(SHAPE)
    n, p, t = 96, 5, 4
    pts = jnp.asarray(
        rng.rand(n, p, 3).astype(np.float32) * (np.asarray(SHAPE) - 1))
    values = jnp.asarray(rng.randn(n, t).astype(np.float32) * 0.1)
    cr = corner_rows(pts, L)
    geo0, krows = rows_from_volume(num, w, key, L,
                                   geo_dtype=jnp.bfloat16)

    orig = rowvol.EARLY_CAST
    try:
        rowvol.EARLY_CAST = True
        g_on, _ = integrate_rows(geo0, krows, cr, values, None, None,
                                 n_tail=t)
        rowvol.EARLY_CAST = False
        g_off, _ = integrate_rows(geo0, krows, cr, values, None, None,
                                  n_tail=t)
    finally:
        rowvol.EARLY_CAST = orig
    np.testing.assert_array_equal(
        np.asarray(g_on).view(np.uint16), np.asarray(g_off).view(np.uint16))


H = W = 24


def _config(geo_dtype):
    cfg = _merge_defaults(Config({}), _DEFAULTS)
    cfg.DATA.resx = W
    cfg.DATA.resy = H
    cfg.DATA.init_value = 0.1
    cfg.DATA.semantics = "class6"
    cfg.DATA.semantic_strategy = "gt"
    cfg.SEMANTIC_2D_MODEL.n_classes = 6
    cfg.FUSION_MODEL.name = "v3"
    cfg.FUSION_MODEL.n_points = 5
    cfg.FUSION_MODEL.n_tail_points = 4
    cfg.FUSION_MODEL.growth_factor = 2
    cfg.FUSION_MODEL.use_semantics = False
    cfg.SETTINGS.geo_dtype = geo_dtype
    return cfg


def _frames(T=4, seed=0):
    rng = np.random.RandomState(seed)
    depth = 1.2 + 0.1 * rng.rand(T, H, W).astype(np.float32)
    depth[:, :2, :2] = 0.0
    poses = np.tile(np.eye(4, dtype=np.float32), (T, 1, 1))
    poses[:, 2, 3] = -1.5
    f = 2.0 * W
    intr = np.array([[f, 0, W / 2], [0, f, H / 2], [0, 0, 1]], np.float32)
    sem = rng.randint(0, 6, (T, H, W)).astype(np.uint8)
    return {
        "depth": jnp.asarray(depth),
        "extrinsics": jnp.asarray(poses),
        "intrinsics": jnp.broadcast_to(jnp.asarray(intr), (T, 3, 3)),
        "mask": jnp.asarray(depth > 0),
        "semantic_gt": jnp.asarray(sem),
    }


def test_pipeline_sequence_geo_dtype_bf16_tracks_f32():
    frames = _frames()
    outs = {}
    for dt in ("float32", "bfloat16"):
        cfg = _config(dt)
        pipe = Pipeline(cfg)
        assert pipe.geo_dtype == (
            jnp.bfloat16 if dt == "bfloat16" else jnp.float32)
        params, stats = pipe.init_fusion_params(jax.random.PRNGKey(0),
                                                H, W)
        vol = init_scene_volume((32, 32, 32),
                                np.array([-1.6, -1.6, -1.6], np.float32),
                                0.1, 0.1)
        outs[dt] = pipe.fuse_sequence((params, stats), vol, frames, None)

    f32, b16 = outs["float32"], outs["bfloat16"]
    np.testing.assert_array_equal(np.asarray(b16.semkey),
                                  np.asarray(f32.semkey))
    # bf16 rounding random-walks over the in-scatter duplicate combines;
    # this tiny volume (576 narrow-FOV rays on 32^3 -> hundreds of
    # updates per voxel per frame) is a worst case, so a few voxels
    # reach ~3% relative
    np.testing.assert_allclose(np.asarray(b16.weights),
                               np.asarray(f32.weights),
                               atol=0.1, rtol=0.05)
    tsdf_f = np.asarray(f32.num) / np.maximum(np.asarray(f32.weights),
                                              1e-6)
    tsdf_b = np.asarray(b16.num) / np.maximum(np.asarray(b16.weights),
                                              1e-6)
    touched = np.asarray(f32.weights) > 0.05
    np.testing.assert_allclose(tsdf_b[touched], tsdf_f[touched],
                               atol=0.02)
