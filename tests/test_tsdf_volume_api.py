"""Tests for the classic TSDFVolume host API (free-space votes, visibility
mask, multiclass voting, depth rendering round trip)."""

import numpy as np
import pytest

from segfusion_tpu.core.tsdf_volume import (MulticlassTSDFVolume, TSDFVolume,
                                            Volume)


def _setup(res=0.1):
    bbox = np.array([[-1.0, 1.0], [-1.0, 1.0], [0.0, 3.0]])
    h = w = 64
    f = 0.6 * w
    k = np.array([[f, 0, w / 2], [0, f, h / 2], [0, 0, 1]], np.float32)
    # camera at origin looking +z; wall plane at z=2
    depth = np.full((h, w), 2.0, np.float32)
    proj = (k @ np.eye(4)[:3]).astype(np.float32)
    return bbox, k, depth, proj, h, w


def test_fuse_wall_plane():
    bbox, k, depth, proj, h, w = _setup()
    vol = TSDFVolume(bbox, 0.1, max_distance=0.3)
    vol.fuse(proj, depth)
    tsdf = vol.volume
    weights = vol.weights
    # voxels near z=2 observed in-band; z index of the wall = (2-0)/0.1 = 20
    assert weights[:, :, 18:22].max() > 0
    center = tsdf[10, 10, :]
    wz = weights[10, 10, :]
    zs = np.nonzero(wz > 0)[0]
    assert len(zs) > 0
    # sdf positive in front of the wall, negative behind
    assert tsdf[10, 10, zs.min()] > 0
    assert tsdf[10, 10, zs.max()] < 0
    # free-space votes accumulate between camera and wall
    fs = vol.free_space
    assert fs[10, 10, 5] < 0
    # observation mask counts in-band voxels
    assert vol.get_mask()[10, 10, zs.min()] >= 1


def test_multiclass_label_voting():
    bbox, k, depth, proj, h, w = _setup()
    labels = np.full((h, w), 3, np.uint8)
    labels[:, : w // 2] = 5
    vol = MulticlassTSDFVolume(bbox, 0.1, n_classes=8, max_distance=0.3)
    vol.fuse(proj, depth, labels)
    probs = vol.label_probs
    assert probs.sum() > 0
    lab = vol.labels
    observed = vol.weights > 0
    used = np.unique(lab[observed])
    assert set(used).issubset({3, 5})
    assert 3 in used and 5 in used


def test_depth_rendering_roundtrip():
    bbox, k, depth, proj, h, w = _setup()
    vol = TSDFVolume(bbox, 0.05, max_distance=0.3)
    for _ in range(3):
        vol.fuse(proj, depth)
    rendered = vol.depth_rendering(np.eye(4, dtype=np.float32), k, (h, w))
    # outer rays leave the [-1,1]^2 bbox before reaching the wall; check
    # the central image quarter
    c = rendered[h // 4: 3 * h // 4, w // 4: 3 * w // 4]
    hit = c > 0
    assert hit.mean() > 0.9
    err = np.abs(c[hit] - 2.0)
    assert np.median(err) < 0.1


def test_visibility_volume():
    bbox, k, depth, proj, h, w = _setup()
    vol = Volume(bbox, 0.1)
    vol.fuse(proj, depth, truncation=0.3)
    vol.fuse(proj, depth, truncation=0.3)
    counts = vol.volume
    assert counts.max() == 2
