"""Unit tests for ops.integrate against numpy goldens that re-derive the
reference integrator math (modules/integrator.py:15-126)."""

import numpy as np
import jax.numpy as jnp

import segfusion_tpu.ops.integrate as I


def golden_integrate(tsdf, weights, values, indices, tri_w, mask):
    """Numpy re-derivation of the reference two-pass index_add_ scheme
    (modules/integrator.py:55-88): accumulate duplicate contributions, then
    write the running weighted average at every touched voxel."""
    tsdf = tsdf.astype(np.float64).copy()
    weights = weights.astype(np.float64).copy()
    shape = tsdf.shape
    dw = np.zeros(shape)
    dnum = np.zeros(shape)
    n, p, _, _ = indices.shape
    for r in range(n):
        if mask is not None and not mask[r]:
            continue
        for q in range(p):
            for c in range(8):
                x, y, z = indices[r, q, c]
                if 0 <= x < shape[0] and 0 <= y < shape[1] and 0 <= z < shape[2]:
                    dw[x, y, z] += tri_w[r, q, c]
                    dnum[x, y, z] += tri_w[r, q, c] * values[r, q]
    new_w = weights + dw
    touched = dw > 0
    new_v = tsdf.copy()
    new_v[touched] = (weights[touched] * tsdf[touched] + dnum[touched]) / new_w[touched]
    return new_v, new_w


def _random_updates(rng, shape, n=20, p=3):
    indices = rng.randint(-1, max(shape) + 1, size=(n, p, 8, 3)).astype(np.int32)
    tri_w = rng.uniform(0, 1, (n, p, 8)).astype(np.float32)
    values = rng.uniform(-0.1, 0.1, (n, p)).astype(np.float32)
    return values, indices, tri_w


def test_integrate_tsdf_matches_golden():
    rng = np.random.RandomState(0)
    shape = (4, 5, 6)
    tsdf = rng.uniform(-0.1, 0.1, shape).astype(np.float32)
    weights = rng.uniform(0, 4, shape).astype(np.float32)
    values, indices, tri_w = _random_updates(rng, shape)
    mask = rng.rand(20) > 0.3

    nv, nw = I.integrate_tsdf(jnp.asarray(tsdf), jnp.asarray(weights),
                              jnp.asarray(values), jnp.asarray(indices),
                              jnp.asarray(tri_w), jnp.asarray(mask))
    gv, gw = golden_integrate(tsdf, weights, values, indices, tri_w, mask)
    np.testing.assert_allclose(np.asarray(nw), gw, atol=1e-4)
    np.testing.assert_allclose(np.asarray(nv), gv, atol=1e-4)


def test_integrate_tsdf_duplicates_accumulate():
    # all 8 corners of 2 points of 1 ray hit the same voxel
    shape = (2, 2, 2)
    tsdf = np.zeros(shape, np.float32)
    weights = np.ones(shape, np.float32)
    indices = np.zeros((1, 2, 8, 3), np.int32)  # all point at voxel (0,0,0)
    tri_w = np.full((1, 2, 8), 0.25, np.float32)
    values = np.array([[0.08, -0.04]], np.float32)

    nv, nw = I.integrate_tsdf(jnp.asarray(tsdf), jnp.asarray(weights),
                              jnp.asarray(values), jnp.asarray(indices),
                              jnp.asarray(tri_w))
    # dw = 16 * 0.25 = 4 ; dnum = 8*0.25*0.08 + 8*0.25*(-0.04) = 0.16 - 0.08
    assert np.isclose(np.asarray(nw)[0, 0, 0], 5.0)
    assert np.isclose(np.asarray(nv)[0, 0, 0], (1 * 0 + 0.08) / 5.0)
    # untouched voxels unchanged
    assert np.isclose(np.asarray(nw)[1, 1, 1], 1.0)


def test_semantic_key_roundtrip():
    rng = np.random.RandomState(1)
    scores = rng.uniform(0, 1, 100).astype(np.float32)
    ids = rng.randint(0, 256, 100).astype(np.uint8)
    key = I.pack_semantic_key(jnp.asarray(scores), jnp.asarray(ids))
    s2, i2 = I.unpack_semantic_key(key)
    np.testing.assert_array_equal(np.asarray(i2), ids)
    np.testing.assert_allclose(np.asarray(s2), scores, atol=2e-7)
    # monotonicity in score
    k1 = I.pack_semantic_key(jnp.asarray([0.5]), jnp.asarray([3], jnp.uint8))
    k2 = I.pack_semantic_key(jnp.asarray([0.6]), jnp.asarray([1], jnp.uint8))
    assert int(k2[0]) > int(k1[0])


def test_integrate_semantics_winner_takes_max():
    shape = (3, 3, 3)
    sem = np.zeros(shape, np.uint8)
    scores = np.zeros(shape, np.float32)
    scores[1, 1, 1] = 0.9
    sem[1, 1, 1] = 7

    # two updates to voxel (1,1,1): one weaker (id 3, 0.5), one stronger (id 5, 0.95)
    indices = np.ones((2, 1, 8, 3), np.int32)
    ids = np.array([3, 5], np.uint8)
    sc = np.array([0.5, 0.95], np.float32)
    new_ids, new_scores = I.integrate_semantics(
        jnp.asarray(sem), jnp.asarray(scores), jnp.asarray(ids),
        jnp.asarray(sc), jnp.asarray(indices))
    assert int(np.asarray(new_ids)[1, 1, 1]) == 5
    assert np.isclose(np.asarray(new_scores)[1, 1, 1], 0.95, atol=1e-6)
    # old winner preserved elsewhere / when stronger
    new_ids2, _ = I.integrate_semantics(
        jnp.asarray(sem), jnp.asarray(scores),
        jnp.asarray(np.array([3], np.uint8)),
        jnp.asarray(np.array([0.5], np.float32)),
        jnp.asarray(np.ones((1, 1, 8, 3), np.int32)))
    assert int(np.asarray(new_ids2)[1, 1, 1]) == 7


def test_integrate_semantics_masked_rays_are_noops():
    shape = (2, 2, 2)
    sem = np.zeros(shape, np.uint8)
    scores = np.zeros(shape, np.float32)
    indices = np.zeros((1, 1, 8, 3), np.int32)
    ids = np.array([9], np.uint8)
    sc = np.array([0.99], np.float32)
    mask = np.array([False])
    new_ids, new_scores = I.integrate_semantics(
        jnp.asarray(sem), jnp.asarray(scores), jnp.asarray(ids),
        jnp.asarray(sc), jnp.asarray(indices), jnp.asarray(mask))
    assert int(np.asarray(new_ids)[0, 0, 0]) == 0
    assert float(np.asarray(new_scores)[0, 0, 0]) == 0.0


def test_full_integrate_jit():
    shape = (4, 4, 4)
    rng = np.random.RandomState(5)
    tsdf = jnp.asarray(np.full(shape, 0.1, np.float32))
    w = jnp.zeros(shape, jnp.float32)
    sem = jnp.zeros(shape, jnp.uint8)
    sc = jnp.zeros(shape, jnp.float32)
    values, indices, tri_w = _random_updates(rng, shape, n=6, p=2)
    out = I.integrate_frame(tsdf, w, sem, sc, jnp.asarray(values),
                      jnp.asarray(indices), jnp.asarray(tri_w),
                      mask=None,
                      ids=jnp.asarray(rng.randint(0, 10, 6).astype(np.uint8)),
                      scores=jnp.asarray(rng.rand(6).astype(np.float32)),
                      update_semantics=True)
    assert out.tsdf.shape == shape
    assert out.weights.dtype == jnp.float32
    assert out.semantics.dtype == jnp.uint8
