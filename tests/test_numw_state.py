"""Equivalence of the accumulator (num, w) state path with the explicit
(tsdf, w) reference math, and of the packed-semkey path with the
two-volume semantic update."""

import numpy as np
import jax.numpy as jnp

import segfusion_tpu.ops.integrate as I
import segfusion_tpu.ops.geometry as G


def _updates(rng, shape, n=30, p=4):
    indices = rng.randint(-1, max(shape) + 1, size=(n, p, 8, 3)).astype(np.int32)
    w = rng.uniform(0, 1, (n, p, 8)).astype(np.float32)
    v = rng.uniform(-0.1, 0.1, (n, p)).astype(np.float32)
    mask = rng.rand(n) > 0.2
    return v, indices, w, mask


def test_numw_matches_explicit_integration():
    rng = np.random.RandomState(0)
    shape = (6, 7, 8)
    init = 0.1
    # start from a state that already saw one round of updates
    num = jnp.zeros(shape, jnp.float32)
    w = jnp.zeros(shape, jnp.float32)
    tsdf = jnp.full(shape, init, jnp.float32)
    w_ref = jnp.zeros(shape, jnp.float32)

    for it in range(3):
        v, idx, tw, mask = _updates(rng, shape)
        num, w = I.integrate_numw(num, w, jnp.asarray(v), jnp.asarray(idx),
                                  jnp.asarray(tw), jnp.asarray(mask))
        tsdf, w_ref = I.integrate_tsdf(tsdf, w_ref, jnp.asarray(v),
                                       jnp.asarray(idx), jnp.asarray(tw),
                                       jnp.asarray(mask))
    np.testing.assert_allclose(np.asarray(w), np.asarray(w_ref), atol=1e-4)
    materialized = np.where(np.asarray(w) > 0,
                            np.asarray(num) / np.maximum(np.asarray(w), 1e-12),
                            init)
    np.testing.assert_allclose(materialized, np.asarray(tsdf), atol=1e-4)


def test_semkey_matches_two_volume_update():
    rng = np.random.RandomState(1)
    shape = (5, 5, 5)
    semkey = jnp.zeros(shape, jnp.int32)
    sem = jnp.zeros(shape, jnp.uint8)
    sc = jnp.zeros(shape, jnp.float32)
    for it in range(3):
        n = 20
        idx = rng.randint(-1, 6, size=(n, 2, 8, 3)).astype(np.int32)
        ids = rng.randint(0, 9, n).astype(np.uint8)
        scores = rng.rand(n).astype(np.float32)
        mask = rng.rand(n) > 0.2
        semkey = I.integrate_semkey(semkey, jnp.asarray(ids),
                                    jnp.asarray(scores), jnp.asarray(idx),
                                    jnp.asarray(mask))
        sem, sc = I.integrate_semantics(sem, sc, jnp.asarray(ids),
                                        jnp.asarray(scores),
                                        jnp.asarray(idx), jnp.asarray(mask))
    got_sc, got_ids = I.unpack_semantic_key(semkey)
    np.testing.assert_array_equal(np.asarray(got_ids), np.asarray(sem))
    np.testing.assert_allclose(np.asarray(got_sc), np.asarray(sc), atol=3e-7)


def test_gather_numw_matches_explicit_gather():
    rng = np.random.RandomState(2)
    shape = (6, 7, 8)
    init = 0.1
    w = rng.uniform(0, 2, shape).astype(np.float32)
    w[w < 0.7] = 0.0  # some unobserved voxels
    tsdf_explicit = np.where(w > 0, rng.randn(*shape).astype(np.float32) * 0.05,
                             init).astype(np.float32)
    num = tsdf_explicit * w

    pts = rng.uniform(-1.0, 9.0, (50, 3, 3)).astype(np.float32)
    fv1, fw1, i1, w1 = G.trilinear_gather(jnp.asarray(pts),
                                          jnp.asarray(tsdf_explicit),
                                          jnp.asarray(w))
    fv2, fw2, i2, w2 = G.trilinear_gather_numw(jnp.asarray(pts),
                                               jnp.asarray(num),
                                               jnp.asarray(w), init)
    np.testing.assert_allclose(np.asarray(fv2), np.asarray(fv1), atol=1e-4)
    np.testing.assert_allclose(np.asarray(fw2), np.asarray(fw1), atol=1e-5)
    np.testing.assert_array_equal(np.asarray(i1), np.asarray(i2))


def test_packed16_gather_matches_f32_within_f16_tolerance():
    rng = np.random.RandomState(3)
    shape = (6, 7, 8)
    init = 0.1
    w = rng.uniform(0, 4, shape).astype(np.float32)
    w[w < 1.0] = 0.0
    tsdf = np.where(w > 0, rng.randn(*shape).astype(np.float32) * 0.05,
                    init).astype(np.float32)
    num = tsdf * w
    pts = rng.uniform(-1.0, 9.0, (60, 3, 3)).astype(np.float32)

    fv32, fw32, i32, w32 = G.trilinear_gather_numw(
        jnp.asarray(pts), jnp.asarray(num), jnp.asarray(w), init)
    fv16, fw16, lin16, valid16, w16 = G.trilinear_gather_packed16(
        jnp.asarray(pts), jnp.asarray(num), jnp.asarray(w), init)
    np.testing.assert_allclose(np.asarray(w16), np.asarray(w32), atol=1e-6)
    # f16 quantisation of num/w: values agree to ~1e-3 relative
    np.testing.assert_allclose(np.asarray(fv16), np.asarray(fv32),
                               atol=2e-3)
    np.testing.assert_allclose(np.asarray(fw16), np.asarray(fw32),
                               atol=2e-2, rtol=1e-3)


def test_factored_corners_match_reference_scheme():
    rng = np.random.RandomState(4)
    shape = (6, 7, 8)
    pts = rng.uniform(-1.5, 9.0, (80, 3, 3)).astype(np.float32)

    idx, w_ref = G.interpolation_weights(jnp.asarray(pts))
    valid_ref = G.valid_index_mask(idx, shape)
    lin_ref = G._flatten_index(G.clamp_indices(idx, shape), shape)

    lin, valid, w = G.interpolation_corners_factored(jnp.asarray(pts), shape)
    np.testing.assert_allclose(np.asarray(w), np.asarray(w_ref), atol=1e-6)
    np.testing.assert_array_equal(np.asarray(valid), np.asarray(valid_ref))
    # linear indices agree wherever the corner is valid (clamping of OOB
    # corners may differ per-axis, but those lanes carry zero weight)
    v = np.asarray(valid)
    np.testing.assert_array_equal(np.asarray(lin)[v],
                                  np.asarray(lin_ref)[v])


def test_lin_integrate_matches_indices_integrate():
    import segfusion_tpu.ops.integrate as I2
    rng = np.random.RandomState(5)
    shape = (6, 7, 8)
    pts = rng.uniform(-1.0, 9.0, (40, 3, 3)).astype(np.float32)
    idx, tri_w = G.interpolation_weights(jnp.asarray(pts))
    lin, valid, tri_w2 = G.interpolation_corners_factored(jnp.asarray(pts),
                                                          shape)
    values = rng.uniform(-0.1, 0.1, (40, 3)).astype(np.float32)
    mask = rng.rand(40) > 0.3
    num = jnp.zeros(shape, jnp.float32)
    w = jnp.zeros(shape, jnp.float32)

    n1, w1 = I2.integrate_numw(num, w, jnp.asarray(values), idx, tri_w,
                               jnp.asarray(mask))
    n2, w2 = I2.integrate_numw_lin(num, w, jnp.asarray(values), lin, valid,
                                   tri_w2, jnp.asarray(mask))
    np.testing.assert_allclose(np.asarray(n2), np.asarray(n1), atol=1e-5)
    np.testing.assert_allclose(np.asarray(w2), np.asarray(w1), atol=1e-5)

    ids = rng.randint(0, 9, 40).astype(np.uint8)
    sc = rng.rand(40).astype(np.float32)
    k1 = I2.integrate_semkey(jnp.zeros(shape, jnp.int32), jnp.asarray(ids),
                             jnp.asarray(sc), idx, jnp.asarray(mask))
    k2 = I2.integrate_semkey_lin(jnp.zeros(shape, jnp.int32),
                                 jnp.asarray(ids), jnp.asarray(sc), lin,
                                 valid, jnp.asarray(mask))
    np.testing.assert_array_equal(np.asarray(k2), np.asarray(k1))
