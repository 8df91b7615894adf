"""Tests for marching-tetrahedra mesh extraction and PLY I/O."""

import numpy as np
import pytest

from segfusion_tpu.native import mcubes
from segfusion_tpu.utils import meshio


def sphere_sdf(n=32, r=10.0):
    x, y, z = np.mgrid[:n, :n, :n].astype(np.float32)
    c = (n - 1) / 2.0
    return np.sqrt((x - c) ** 2 + (y - c) ** 2 + (z - c) ** 2) - r


@pytest.mark.parametrize("impl", ["native", "numpy"])
def test_sphere_mesh_accuracy(impl):
    sdf = sphere_sdf()
    if impl == "native":
        if not mcubes.native_available():
            pytest.skip("native lib not built")
        v, f, n = mcubes.marching_cubes(sdf, 0.0, spacing=1.0)
    else:
        v, f, n = mcubes._marching_tetrahedra_numpy(sdf, 0.0, 1.0)

    assert len(v) > 500 and len(f) > 500
    center = (sdf.shape[0] - 1) / 2.0
    radii = np.linalg.norm(v - center, axis=1)
    # all vertices within half a voxel of the true sphere
    assert np.abs(radii - 10.0).max() < 0.5
    # faces index valid vertices
    assert f.min() >= 0 and f.max() < len(v)
    # normals unit length, pointing outward (same direction as radius vector)
    assert np.allclose(np.linalg.norm(n, axis=1), 1.0, atol=1e-3)
    outward = np.sum(n * (v - center), axis=1)
    assert (outward > 0).mean() > 0.99


def test_native_and_numpy_agree_on_vertex_count_scale():
    sdf = sphere_sdf(n=20, r=6.0)
    if not mcubes.native_available():
        pytest.skip("native lib not built")
    v1, f1, _ = mcubes.marching_cubes(sdf, 0.0)
    v2, f2, _ = mcubes._marching_tetrahedra_numpy(sdf, 0.0, 1.0)
    assert len(v1) == len(v2)
    assert len(f1) == len(f2)


def test_spacing_scales_vertices():
    sdf = sphere_sdf(n=20, r=6.0)
    v1, _, _ = mcubes.marching_cubes(sdf, 0.0, spacing=1.0)
    v2, _, _ = mcubes.marching_cubes(sdf, 0.0, spacing=0.25)
    np.testing.assert_allclose(v2, v1 * 0.25, atol=1e-5)


def test_no_crossing_raises():
    with pytest.raises(ValueError):
        mcubes.marching_cubes(np.ones((8, 8, 8), np.float32), 0.0)


def test_watertight_edges():
    # every edge of a closed surface must be shared by exactly 2 faces
    sdf = sphere_sdf(n=24, r=8.0)
    _, f, _ = mcubes.marching_cubes(sdf, 0.0)
    edges = np.concatenate([f[:, [0, 1]], f[:, [1, 2]], f[:, [2, 0]]])
    edges = np.sort(edges, axis=1)
    _, counts = np.unique(edges, axis=0, return_counts=True)
    assert (counts == 2).mean() > 0.99


def test_ply_roundtrip(tmp_path):
    sdf = sphere_sdf(n=16, r=5.0)
    v, f, n = mcubes.marching_cubes(sdf, 0.0, spacing=0.05)
    p = str(tmp_path / "mesh.ply")
    meshio.write_ply(p, v, f, normals=n)
    v2, f2 = meshio.read_ply(p)
    np.testing.assert_allclose(v2, v, atol=1e-6)
    np.testing.assert_array_equal(f2, f)


def test_ply_with_rgba_colors(tmp_path):
    v = np.array([[0, 0, 0], [1, 0, 0], [0, 1, 0]], np.float32)
    f = np.array([[0, 1, 2]], np.int32)
    rgba = np.array([[255, 0, 0, 7], [0, 255, 0, 8], [0, 0, 255, 9]],
                    np.uint8)
    p = str(tmp_path / "sem.ply")
    meshio.write_ply(p, v, f, colors=rgba)
    v2, f2 = meshio.read_ply(p)
    np.testing.assert_allclose(v2, v)
    np.testing.assert_array_equal(f2, f)
