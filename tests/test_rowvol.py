"""Row-layout state (ops/rowvol.py) must be numerically equivalent to
the flat scalar gather/scatter path on random and adversarial inputs:
round-trip conversions exact, extraction == packed-f16 flat extraction,
integration == flat scatter integration (same f16 read precision, float
summation-order tolerance only), semantic keys bit-exact."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from segfusion_tpu.ops import geometry, integrate as integ
from segfusion_tpu.ops.rowvol import (RowLayout, build_shadow, corner_rows,
                                      extract_rows, integrate_rows,
                                      rows_from_volume, volume_from_rows)

SHAPE = (20, 21, 140)  # odd y, z > 128: exercises pair edge + z blocks


def _state(rng, shape=SHAPE):
    num = rng.randn(*shape).astype(np.float32)
    w = (rng.rand(*shape) * 3).astype(np.float32)
    w[w < 0.4] = 0.0
    key = (rng.rand(*shape) * (1 << 20)).astype(np.int32)
    return jnp.asarray(num), jnp.asarray(w), jnp.asarray(key)


def _points(rng, n, p, shape, oob_frac=0.15):
    pts = rng.rand(n, p, 3) * (np.asarray(shape) - 1)
    # push some rays (partially) out of bounds on every side
    k = int(n * oob_frac)
    pts[:k, :, 0] -= shape[0] * 0.5
    pts[n - k:, :, 2] += shape[2] * 0.5
    # exact centers + integral coords (sign(0) degenerate corners)
    pts[k:k + 5] = np.floor(pts[k:k + 5]) + 0.5
    pts[k + 5:k + 10] = np.floor(pts[k + 5:k + 10])
    # z-block straddles: z-pair exactly across 127/128
    pts[k + 10:k + 15, :, 2] = 127.3 + 0.2 * rng.rand(5, p)
    # y-pair parity edges
    pts[k + 15:k + 20, :, 1] = np.clip(
        2 * rng.randint(0, shape[1] // 2, (5, p)) + 1.4, 0, shape[1] - 1)
    return jnp.asarray(pts.astype(np.float32))


def test_roundtrip_exact():
    rng = np.random.RandomState(0)
    num, w, key = _state(rng)
    L = RowLayout.for_shape(SHAPE)
    geo, krows = rows_from_volume(num, w, key, L)
    num2, w2, key2 = volume_from_rows(geo, krows, L)
    np.testing.assert_array_equal(np.asarray(num2), np.asarray(num))
    np.testing.assert_array_equal(np.asarray(w2), np.asarray(w))
    np.testing.assert_array_equal(np.asarray(key2), np.asarray(key))


def test_extract_rows_matches_flat_packed16():
    rng = np.random.RandomState(1)
    num, w, key = _state(rng)
    L = RowLayout.for_shape(SHAPE)
    pts = _points(rng, 64, 5, SHAPE)

    fv_ref, fw_ref, _, _, _ = geometry.trilinear_gather_packed16(
        pts, num, w, init_value=0.1)

    geo, _ = rows_from_volume(num, w, key, L)
    shadow = build_shadow(geo, L)
    cr = corner_rows(pts, L)
    fv, fw = extract_rows(shadow, cr, init_value=0.1,
                          fill_value=geometry.INVALID_TSDF_FILL)

    np.testing.assert_allclose(np.asarray(fv), np.asarray(fv_ref),
                               atol=2e-5, rtol=1e-5)
    np.testing.assert_allclose(np.asarray(fw), np.asarray(fw_ref),
                               atol=2e-5, rtol=1e-5)


@pytest.mark.parametrize("with_mask", [False, True])
def test_integrate_rows_matches_flat(with_mask):
    rng = np.random.RandomState(2)
    num, w, key = _state(rng)
    L = RowLayout.for_shape(SHAPE)
    n, p, t = 64, 5, 4
    pts = _points(rng, n, p, SHAPE)
    values = jnp.asarray(rng.randn(n, t).astype(np.float32) * 0.1)
    ids = jnp.asarray(rng.randint(1, 9, n).astype(np.uint8))
    scores = jnp.asarray(rng.rand(n).astype(np.float32))
    mask = jnp.asarray(rng.rand(n) > 0.3) if with_mask else None

    # flat reference path
    indices, weights = geometry.interpolation_weights(pts)
    num_ref, w_ref = integ.integrate_numw(
        num, w, values, indices[:, :t], weights[:, :t], mask)
    key_ref = integ.integrate_semkey(key, ids, scores, indices[:, :t],
                                     mask)

    # row path
    geo, krows = rows_from_volume(num, w, key, L)
    cr = corner_rows(pts, L)
    sem_key = integ.pack_semantic_key(scores, ids)
    new_geo, new_key = integrate_rows(geo, krows, cr, values, sem_key,
                                      mask, n_tail=t)
    num2, w2, key2 = volume_from_rows(new_geo, new_key, L)

    np.testing.assert_allclose(np.asarray(num2), np.asarray(num_ref),
                               atol=3e-5, rtol=1e-5)
    np.testing.assert_allclose(np.asarray(w2), np.asarray(w_ref),
                               atol=3e-5, rtol=1e-5)
    np.testing.assert_array_equal(np.asarray(key2), np.asarray(key_ref))


def test_integrate_rows_z128_multiple():
    """Z an exact multiple of 128 (no z padding) + straddle points."""
    shape = (8, 9, 128)
    rng = np.random.RandomState(3)
    num, w, key = _state(rng, shape)
    L = RowLayout.for_shape(shape)
    n, p, t = 32, 3, 3
    pts = rng.rand(n, p, 3).astype(np.float32) * (np.asarray(shape) - 1)
    pts[:8, :, 2] = 126.9 + 0.4 * rng.rand(8, p)  # cross the block edge
    pts = jnp.asarray(pts)
    values = jnp.asarray(rng.randn(n, t).astype(np.float32) * 0.1)

    indices, weights = geometry.interpolation_weights(pts)
    num_ref, w_ref = integ.integrate_numw(num, w, values,
                                          indices[:, :t], weights[:, :t])

    geo, krows = rows_from_volume(num, w, key, L)
    cr = corner_rows(pts, L)
    new_geo, new_key = integrate_rows(geo, krows, cr, values, None, None,
                                      n_tail=t)
    num2, w2, key2 = volume_from_rows(new_geo, new_key, L)
    np.testing.assert_allclose(np.asarray(num2), np.asarray(num_ref),
                               atol=3e-5, rtol=1e-5)
    np.testing.assert_allclose(np.asarray(w2), np.asarray(w_ref),
                               atol=3e-5, rtol=1e-5)
    np.testing.assert_array_equal(np.asarray(key2), np.asarray(key))


def test_chunked_paths_match_single_block():
    """Forcing small ray chunks (the full-resolution memory mode) must
    reproduce the single-block result exactly."""
    rng = np.random.RandomState(4)
    num, w, key = _state(rng)
    L = RowLayout.for_shape(SHAPE)
    n, p, t = 64, 5, 4
    pts = _points(rng, n, p, SHAPE)
    values = jnp.asarray(rng.randn(n, t).astype(np.float32) * 0.1)
    sem_key = integ.pack_semantic_key(
        jnp.asarray(rng.rand(n).astype(np.float32)),
        jnp.asarray(rng.randint(1, 9, n).astype(np.uint8)))

    geo, krows = rows_from_volume(num, w, key, L)
    shadow = build_shadow(geo, L)
    cr = corner_rows(pts, L)

    fv1, fw1 = extract_rows(shadow, cr, 0.1, geometry.INVALID_TSDF_FILL)
    fv2, fw2 = extract_rows(shadow, cr, 0.1, geometry.INVALID_TSDF_FILL,
                            chunk=16)
    # ulp-level reassociation only (different XLA fusion across chunks)
    np.testing.assert_allclose(np.asarray(fv1), np.asarray(fv2),
                               atol=1e-6, rtol=1e-5)
    np.testing.assert_allclose(np.asarray(fw1), np.asarray(fw2),
                               atol=1e-6, rtol=1e-5)

    g1, k1 = integrate_rows(geo, krows, cr, values, sem_key, None, t)
    g2, k2 = integrate_rows(geo, krows, cr, values, sem_key, None, t,
                            chunk=16)
    np.testing.assert_allclose(np.asarray(g1), np.asarray(g2),
                               atol=1e-6, rtol=1e-6)
    np.testing.assert_array_equal(np.asarray(k1), np.asarray(k2))


def test_pipeline_row_path_matches_scalar_path():
    """End-to-end: Pipeline.fuse with SETTINGS.integration rows vs scalar
    over several frames + a scene with semantics."""
    from segfusion_tpu.core.database import Database
    from segfusion_tpu.core.pipeline import Pipeline
    from segfusion_tpu.data.synthetic import Synthetic
    from tests.test_pipeline import small_config, _batch

    cfg = small_config(use_semantics=True, semantics="class8")
    cfg.DATA.semantic_grid = True
    data = Synthetic(cfg.DATA)
    db = Database(data, cfg.DATA)

    results = {}
    for mode in ("scalar", "rows"):
        cfg.SETTINGS.integration = mode
        pipe = Pipeline(cfg)
        params, stats = pipe.init_fusion_params(jax.random.PRNGKey(0),
                                                48, 48)
        db.reset()
        for i in range(4):
            pipe.fuse(_batch(data, i), db, params, stats)
        s = data.scenes[0]
        results[mode] = (np.asarray(db.volumes[s].num),
                         np.asarray(db.volumes[s].weights),
                         np.asarray(db.volumes[s].semkey))

    num_s, w_s, key_s = results["scalar"]
    num_r, w_r, key_r = results["rows"]
    np.testing.assert_allclose(num_r, num_s, atol=1e-4, rtol=1e-4)
    np.testing.assert_allclose(w_r, w_s, atol=1e-4, rtol=1e-4)
    np.testing.assert_array_equal(key_r, key_s)


def test_extract_reduce_modes_bit_identical():
    """The two one-hot reduce formulations in _extract_block ("quarter" /
    "select128") must be bit-exact so the default can be picked purely
    by TPU measurement."""
    from segfusion_tpu.ops import rowvol as RV

    rng = np.random.RandomState(5)
    num, w, key = _state(rng)
    L = RowLayout.for_shape(SHAPE)
    pts = _points(rng, 64, 5, SHAPE)
    geo, _ = rows_from_volume(num, w, key, L)
    shadow = build_shadow(geo, L)
    cr = corner_rows(pts, L)

    orig = RV.EXTRACT_REDUCE
    try:
        RV.EXTRACT_REDUCE = "quarter"
        fv1, fw1 = extract_rows(shadow, cr, 0.1,
                                geometry.INVALID_TSDF_FILL)
        RV.EXTRACT_REDUCE = "select128"
        fv2, fw2 = extract_rows(shadow, cr, 0.1,
                                geometry.INVALID_TSDF_FILL)
    finally:
        RV.EXTRACT_REDUCE = orig
    np.testing.assert_array_equal(np.asarray(fv1), np.asarray(fv2))
    np.testing.assert_array_equal(np.asarray(fw1), np.asarray(fw2))


def test_update_build_modes_bit_identical():
    """The two scatter update-build formulations in _integrate_block
    ("minor16" one-hot + relayout reshape vs "lane128" select tree) must
    be bit-exact so the default is a pure measurement choice."""
    from segfusion_tpu.ops import integrate as integ
    from segfusion_tpu.ops import rowvol as RV

    rng = np.random.RandomState(11)
    num, w, key = _state(rng)
    L = RowLayout.for_shape(SHAPE)
    n, p, t = 64, 5, 4
    pts = _points(rng, n, p, SHAPE)
    values = jnp.asarray(rng.randn(n, t).astype(np.float32) * 0.1)
    ids = jnp.asarray(rng.randint(1, 9, n).astype(np.uint8))
    scores = jnp.asarray(rng.rand(n).astype(np.float32))
    mask = jnp.asarray(rng.rand(n) > 0.3)
    sem_key = integ.pack_semantic_key(scores, ids)
    geo, krows = rows_from_volume(num, w, key, L)
    cr = corner_rows(pts, L)

    orig = RV.UPDATE_BUILD
    try:
        RV.UPDATE_BUILD = "minor16"
        g1, k1 = integrate_rows(geo, krows, cr, values, sem_key, mask,
                                n_tail=t)
        RV.UPDATE_BUILD = "lane128"
        g2, k2 = integrate_rows(geo, krows, cr, values, sem_key, mask,
                                n_tail=t)
    finally:
        RV.UPDATE_BUILD = orig
    np.testing.assert_array_equal(np.asarray(g1), np.asarray(g2))
    np.testing.assert_array_equal(np.asarray(k1), np.asarray(k2))


def test_gather_dedup_bit_identical():
    """GATHER_DEDUP re-targets duplicate consecutive in-tail gather rows
    at row 0 and forward-fills the gathered values -- must be bit-exact
    (reusing a gathered row == re-gathering it)."""
    from segfusion_tpu.ops import rowvol as RV

    rng = np.random.RandomState(17)
    num, w, key = _state(rng)
    L = RowLayout.for_shape(SHAPE)
    n, p = 96, 6
    pts = _points(rng, n, p, SHAPE)
    # duplicate-heavy tails (samples ~0.4 voxels apart along z)
    pts = pts.at[:, 1:, :].set(
        pts[:, :1, :] + 0.4 * np.arange(1, p)[None, :, None])
    geo, _ = rows_from_volume(num, w, key, L)
    shadow = build_shadow(geo, L)
    cr = corner_rows(pts, L)

    orig = RV.GATHER_DEDUP
    try:
        RV.GATHER_DEDUP = False
        fv1, fw1 = extract_rows(shadow, cr, 0.1,
                                geometry.INVALID_TSDF_FILL)
        RV.GATHER_DEDUP = True
        fv2, fw2 = extract_rows(shadow, cr, 0.1,
                                geometry.INVALID_TSDF_FILL)
    finally:
        RV.GATHER_DEDUP = orig
    np.testing.assert_array_equal(np.asarray(fv1), np.asarray(fv2))
    np.testing.assert_array_equal(np.asarray(fw1), np.asarray(fw2))


@pytest.mark.parametrize("chunk", [0, 64])
def test_merge_dup_equivalent(chunk):
    """MERGE_DUP pre-combines duplicate consecutive slot rows within each
    (ray, x-corner) tail before the scatters. Not bit-exact for geo (the
    duplicate contributions are pre-summed in a different association
    order -> allclose); keys are bit-exact (max is associative and
    idempotent). Pad rows (geo row 0) must stay zero."""
    from segfusion_tpu.ops import integrate as integ
    from segfusion_tpu.ops import rowvol as RV

    rng = np.random.RandomState(13)
    num, w, key = _state(rng)
    L = RowLayout.for_shape(SHAPE)
    n, p, t = 128, 6, 4
    pts = _points(rng, n, p, SHAPE)
    # make tails duplicate-heavy: samples step ~0.3 voxels along z, so
    # consecutive tail samples share the geo z-group most of the time
    pts = pts.at[:, 1:, :].set(
        pts[:, :1, :] + 0.3 * np.arange(1, p)[None, :, None])
    values = jnp.asarray(rng.randn(n, t).astype(np.float32) * 0.1)
    ids = jnp.asarray(rng.randint(1, 9, n).astype(np.uint8))
    scores = jnp.asarray(rng.rand(n).astype(np.float32))
    mask = jnp.asarray(rng.rand(n) > 0.3)
    sem_key = integ.pack_semantic_key(scores, ids)
    geo, krows = rows_from_volume(num, w, key, L)
    cr = corner_rows(pts, L)
    kw = {"chunk": chunk} if chunk else {}

    orig = RV.MERGE_DUP
    try:
        RV.MERGE_DUP = False
        g1, k1 = integrate_rows(geo, krows, cr, values, sem_key, mask,
                                n_tail=t, **kw)
        RV.MERGE_DUP = True
        g2, k2 = integrate_rows(geo, krows, cr, values, sem_key, mask,
                                n_tail=t, **kw)
    finally:
        RV.MERGE_DUP = orig
    np.testing.assert_allclose(np.asarray(g1), np.asarray(g2),
                               atol=3e-5, rtol=1e-5)
    np.testing.assert_array_equal(np.asarray(k1), np.asarray(k2))
    # writer invariant: the y=-1 pad rows that absorb merged leftovers
    # must still be exactly zero
    assert float(np.abs(np.asarray(g2)[0]).max()) == 0.0
