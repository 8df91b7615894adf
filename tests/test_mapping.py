"""Label-table fidelity: names and palettes must match the reference's
constant tables (reference utils/mapping.py:4-277) since per-class metric
tables and exported mesh colors are compared against reference output."""

import numpy as np

from segfusion_tpu.utils.mapping import (
    NYU20_CLASSES, NYU40_CLASSES, REPLICA_CLASSES, get_mapping,
    nyu20_color_palette, nyu40_to_nyu20_map, replica_color_palette,
    scannet_color_palette, scannet_main_ids)


def test_replica_names_verbatim():
    assert len(REPLICA_CLASSES) == 30
    assert REPLICA_CLASSES[0] == "undefined"
    # spot-check the reference ordering (utils/mapping.py:77-109)
    assert REPLICA_CLASSES[1] == "beanbag"
    assert REPLICA_CLASSES[7] == "chair"
    assert REPLICA_CLASSES[13] == "floor"
    assert REPLICA_CLASSES[14] == "indoor-plant"
    assert REPLICA_CLASSES[24] == "tv-screen"
    assert REPLICA_CLASSES[29] == "window"


def test_nyu_names():
    assert len(NYU40_CLASSES) == 41 and len(NYU20_CLASSES) == 21
    assert NYU40_CLASSES[32] == "nightstand"
    assert NYU40_CLASSES[24] == "refridgerator"  # reference's spelling
    assert NYU20_CLASSES[13] == "desk"


def test_palettes_verbatim():
    rep = replica_color_palette()
    assert rep.shape == (40, 3)
    assert rep[0].tolist() == [31, 119, 180]
    assert rep[39].tolist() == [222, 158, 214]
    scan = scannet_color_palette()
    assert scan.shape == (41, 3)
    assert scan[0].tolist() == [0, 0, 0]
    assert scan[1].tolist() == [174, 199, 232]   # wall
    assert scan[40].tolist() == [100, 85, 144]
    sub = nyu20_color_palette()
    assert sub.shape == (21, 3)
    assert np.array_equal(sub, scan[np.asarray(scannet_main_ids())])


def test_get_mapping_matches_reference_construction():
    m = get_mapping()
    assert m.shape == (256, 3)
    # entry 0 black; 1..39 = base palette rows 1..39; blocks of 40 are
    # channel permutations; tail pinned to the reference's seeded shuffles
    assert m[0].tolist() == [0, 0, 0]
    assert m[1].tolist() == [174, 199, 232]
    assert m[40].tolist() == [31, 180, 119]     # [0,2,1] permutation of row 0
    assert m[200].tolist() == [180, 31, 119]    # [2,0,1] permutation of row 0
    assert m[255].tolist() == [255, 9, 110]     # seeded random tail


def test_nyu40_to_nyu20_roundtrip():
    lut = nyu40_to_nyu20_map()
    ids = scannet_main_ids()
    for bench_idx, nyu40 in enumerate(ids):
        assert lut[nyu40] == bench_idx
    assert lut[13] == 0  # blinds not in benchmark subset
