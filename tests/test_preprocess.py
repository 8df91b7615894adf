"""Offline preprocessing pipeline tests: rasterizer + watertight fusion
round trip (the reference's mesh-fusion pipeline, SURVEY.md §2.5)."""

import os
import sys

import numpy as np
import pytest

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)),
                                "..", "tools", "preprocess"))

from segfusion_tpu.native import mcubes
from segfusion_tpu.native.rasterize import rasterize_depth, _rasterize_numpy


def unit_sphere_mesh(r=0.4, n=48):
    x, y, z = np.mgrid[:n, :n, :n].astype(np.float32)
    c = (n - 1) / 2
    sdf = np.sqrt((x - c) ** 2 + (y - c) ** 2 + (z - c) ** 2) - r * n
    v, f, _ = mcubes.marching_cubes(sdf, 0.0, spacing=1.0 / n)
    return (v - 0.5).astype(np.float32), f


def test_rasterizer_depth_of_sphere():
    verts, faces = unit_sphere_mesh()
    from common import look_at_view
    eye = np.array([0.0, 0.0, -1.2], np.float32)
    view = look_at_view(eye)
    h = w = 128
    f = 1.2 * w
    k = np.array([[f, 0, w / 2], [0, f, h / 2], [0, 0, 1]], np.float32)
    d = rasterize_depth(verts, faces, view, k, h, w, znear=0.1, zfar=5.0)
    center_depth = d[h // 2, w // 2]
    # sphere front face is ~1.2 - 0.4 - half-cell from the eye
    assert abs(center_depth - 0.8) < 0.05, center_depth
    assert d[2, 2] == 0.0  # background miss
    assert (d > 0).mean() > 0.05


def test_native_and_numpy_rasterizer_agree():
    verts, faces = unit_sphere_mesh(n=24)
    from common import look_at_view
    view = look_at_view(np.array([0.6, 0.5, -1.0], np.float32))
    h = w = 48
    k = np.array([[60.0, 0, 24], [0, 60.0, 24], [0, 0, 1]], np.float32)
    d1 = rasterize_depth(verts, faces, view, k, h, w)
    d2 = _rasterize_numpy(verts.astype(np.float32), faces.astype(np.int32),
                          view, k, h, w, 0.05, 100.0)
    hit_both = (d1 > 0) & (d2 > 0)
    assert hit_both.mean() > 0.03
    np.testing.assert_allclose(d1[hit_both], d2[hit_both], atol=1e-3)


def test_watertight_fusion_roundtrip():
    """mesh -> rendered views -> TSDF fusion -> marching cubes must
    reproduce the sphere (the 2_fusion.py capability)."""
    from fuse import fuse_mesh
    verts, faces = unit_sphere_mesh(r=0.35)
    tsdf, weights, origin, voxel = fuse_mesh(
        verts, faces, n_views=24, grid_res=64, image_size=128)
    mv, mf, _ = mcubes.marching_cubes(tsdf, 0.0, spacing=voxel)
    mv = mv + origin[None, :]
    radii = np.linalg.norm(mv, axis=1)
    assert abs(np.median(radii) - 0.35) < 0.03, np.median(radii)
    # watertight: every edge shared by exactly 2 faces
    edges = np.sort(np.concatenate([mf[:, [0, 1]], mf[:, [1, 2]],
                                    mf[:, [2, 0]]]), axis=1)
    _, counts = np.unique(edges, axis=0, return_counts=True)
    assert (counts == 2).mean() > 0.99


def test_simplify_reduces_vertices():
    from simplify import simplify
    verts, faces = unit_sphere_mesh(r=0.4, n=48)
    sv, sf = simplify(verts, faces, cluster=0.05)
    assert len(sv) < len(verts) / 2
    assert len(sf) > 0
    radii = np.linalg.norm(sv, axis=1)
    assert abs(np.median(radii) - 0.4) < 0.05
