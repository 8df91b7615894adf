"""Unit tests for ops.geometry against small hand-computed / numpy goldens.

The golden implementations re-derive the reference math (cited per test) in
plain numpy loops so the vectorised JAX ops are checked independently.
"""

import numpy as np
import jax.numpy as jnp
import pytest

from segfusion_tpu.ops import geometry


def simple_intrinsics(h, w, f=100.0):
    return np.array([[f, 0, w / 2.0], [0, f, h / 2.0], [0, 0, 1.0]],
                    dtype=np.float32)


def test_unproject_identity_pose():
    h, w = 4, 6
    k = simple_intrinsics(h, w)
    ext = np.eye(4, dtype=np.float32)
    depth = 2.0 * np.ones((h, w), np.float32)
    pts = np.asarray(geometry.unproject(jnp.asarray(depth), jnp.asarray(ext),
                                        jnp.asarray(k)))
    # golden: for pixel (v=row, u=col): X_c = K^-1 [u d, v d, d]
    kinv = np.linalg.inv(k)
    for v in range(h):
        for u in range(w):
            p = kinv @ np.array([u * 2.0, v * 2.0, 2.0])
            np.testing.assert_allclose(pts[v * w + u], p, atol=1e-5)


def test_unproject_with_pose():
    h, w = 3, 3
    k = simple_intrinsics(h, w)
    # camera-to-world: rotate 90 deg about z, translate
    c = np.cos(np.pi / 2)
    s = np.sin(np.pi / 2)
    ext = np.array([[c, -s, 0, 1.0], [s, c, 0, -2.0],
                    [0, 0, 1, 0.5], [0, 0, 0, 1]], np.float32)
    depth = np.random.RandomState(0).uniform(0.5, 3.0, (h, w)).astype(np.float32)
    pts = np.asarray(geometry.unproject(jnp.asarray(depth), jnp.asarray(ext),
                                        jnp.asarray(k)))
    kinv = np.linalg.inv(k)
    for v in range(h):
        for u in range(w):
            d = depth[v, u]
            pc = kinv @ np.array([u * d, v * d, d])
            pw = ext[:3, :3] @ pc + ext[:3, 3]
            np.testing.assert_allclose(pts[v * w + u], pw, atol=1e-4)


def test_sample_ray_points_ordering():
    # reference ordering: [c-4, c-3, ..., c, ..., c+4] along eye->center dir
    # (reference modules/extractor.py:327-337 insert(0)/append)
    pts_w = np.array([[5.0, 0.0, 0.0]], np.float32)
    eye = np.array([0.0, 0.0, 0.0], np.float32)
    origin = np.zeros(3, np.float32)
    res = 1.0
    pv, dists = geometry.sample_ray_points(jnp.asarray(pts_w), jnp.asarray(eye),
                                           jnp.asarray(origin), res, 9)
    pv = np.asarray(pv)[0]
    d = np.asarray(dists)[0]
    np.testing.assert_allclose(d, np.arange(-4, 5, dtype=np.float32))
    # direction is +x, so x coords run 1..9
    np.testing.assert_allclose(pv[:, 0], np.arange(1, 10, dtype=np.float32),
                               atol=1e-5)
    np.testing.assert_allclose(pv[:, 1:], 0.0, atol=1e-6)


def golden_interp_weights(points):
    """Plain-numpy re-derivation of reference interpolation_weights
    (modules/extractor.py:533-593, mode='center')."""
    points = np.asarray(points, np.float64)
    idx = np.floor(points)
    center = idx + 0.5
    neighbor = np.sign(center - points)
    alpha = np.abs(points - center)
    alpha_inv = 1 - alpha
    weights, indices = [], []
    for i in range(2):
        for j in range(2):
            for k in range(2):
                w1 = alpha_inv[:, 0] if i == 0 else alpha[:, 0]
                ix = idx[:, 0] if i == 0 else idx[:, 0] + neighbor[:, 0]
                w2 = alpha_inv[:, 1] if j == 0 else alpha[:, 1]
                iy = idx[:, 1] if j == 0 else idx[:, 1] + neighbor[:, 1]
                w3 = alpha_inv[:, 2] if k == 0 else alpha[:, 2]
                iz = idx[:, 2] if k == 0 else idx[:, 2] + neighbor[:, 2]
                weights.append(w1 * w2 * w3)
                indices.append(np.stack([ix, iy, iz], axis=1))
    return (np.stack(indices, axis=1).astype(np.int64),
            np.stack(weights, axis=1))


def test_interpolation_weights_match_golden():
    rng = np.random.RandomState(1)
    pts = rng.uniform(-1.0, 6.0, (64, 3)).astype(np.float32)
    idx, w = geometry.interpolation_weights(jnp.asarray(pts))
    gi, gw = golden_interp_weights(pts)
    np.testing.assert_allclose(np.asarray(w), gw, atol=1e-5)
    np.testing.assert_array_equal(np.asarray(idx), gi)


def test_interpolation_weights_sum_to_one():
    rng = np.random.RandomState(2)
    pts = rng.uniform(0.0, 10.0, (128, 3)).astype(np.float32) + 0.01
    _, w = geometry.interpolation_weights(jnp.asarray(pts))
    np.testing.assert_allclose(np.asarray(w).sum(-1), 1.0, atol=1e-5)


def test_trilinear_gather_matches_golden():
    rng = np.random.RandomState(3)
    vol = rng.randn(5, 6, 7).astype(np.float32)
    wvol = rng.uniform(0, 3, (5, 6, 7)).astype(np.float32)
    # include out-of-bounds points on purpose
    pts = rng.uniform(-1.5, 8.0, (40, 3, 3)).astype(np.float32)

    fv, fw, _, _ = geometry.trilinear_gather(jnp.asarray(pts),
                                             jnp.asarray(vol),
                                             jnp.asarray(wvol))
    flat = pts.reshape(-1, 3)
    gi, gw = golden_interp_weights(flat)
    gold_v = np.zeros(len(flat))
    gold_w = np.zeros(len(flat))
    for n in range(len(flat)):
        for c in range(8):
            x, y, z = gi[n, c]
            inb = (0 <= x < 5) and (0 <= y < 6) and (0 <= z < 7)
            # reference container scheme: OOB corner reads -0.1 / 0
            # (modules/extractor.py:663-667)
            v = vol[x, y, z] if inb else -0.1
            wv = wvol[x, y, z] if inb else 0.0
            gold_v[n] += v * gw[n, c]
            gold_w[n] += wv * gw[n, c]
    np.testing.assert_allclose(np.asarray(fv).reshape(-1), gold_v, atol=1e-4)
    np.testing.assert_allclose(np.asarray(fw).reshape(-1), gold_w, atol=1e-4)


def test_extract_shapes():
    h, w, n = 8, 10, 9
    k = simple_intrinsics(h, w, f=20.0)
    ext = np.eye(4, dtype=np.float32)
    ext[2, 3] = -1.0
    depth = np.full((h, w), 1.5, np.float32)
    vol = np.full((16, 16, 16), 0.1, np.float32)
    wvol = np.zeros_like(vol)
    origin = np.array([-1.0, -1.0, 0.0], np.float32)
    out = geometry.extract(jnp.asarray(depth), jnp.asarray(ext),
                           jnp.asarray(k), jnp.asarray(vol),
                           jnp.asarray(wvol), jnp.asarray(origin), 0.125,
                           n_points=n)
    assert out.fusion_values.shape == (h * w, n)
    assert out.fusion_weights.shape == (h * w, n)
    assert out.indices.shape == (h * w, n, 8, 3)
    assert out.weights.shape == (h * w, n, 8)
    assert out.pcl.shape == (h * w, 3)
    assert np.all(np.isfinite(np.asarray(out.fusion_values)))
