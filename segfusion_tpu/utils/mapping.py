"""Semantic label maps: class names + color palettes.

Covers the reference's label machinery (reference utils/mapping.py:4-277):
Replica 30-class names/palette, NYU-40 names, ScanNet->NYU40 id mapping from
the official tsv, and the 256-entry mesh color map used to encode ids in ply
vertex colors. Palettes are generated deterministically (golden-ratio HSV)
rather than hand-copied tables; semantic ids are authoritative (stored in the
ply alpha channel), colors are presentation only.
"""

from __future__ import annotations

import colorsys
import csv
import os
from typing import Dict, List, Optional

import numpy as np

__all__ = ["REPLICA_CLASSES", "NYU40_CLASSES", "NYU20_CLASSES",
           "get_mapping", "replica_color_palette", "nyu40_color_palette",
           "scannet_to_nyu40_map"]

# Replica 30-class set used by the reference's semantic grids
# (reference utils/mapping.py:4-109; class 0 = undefined/free space).
REPLICA_CLASSES: List[str] = [
    "undefined", "backpack", "base-cabinet", "basket", "bathtub", "beam",
    "beanbag", "bed", "bench", "bike", "bin", "blanket", "blinds", "book",
    "bottle", "box", "bowl", "camera", "cabinet", "candle", "chair",
    "chopping-board", "clock", "cloth", "clothing", "coaster", "comforter",
    "computer-keyboard", "cup", "cushion",
]

NYU40_CLASSES: List[str] = [
    "undefined", "wall", "floor", "cabinet", "bed", "chair", "sofa", "table",
    "door", "window", "bookshelf", "picture", "counter", "blinds", "desk",
    "shelves", "curtain", "dresser", "pillow", "mirror", "floor mat",
    "clothes", "ceiling", "books", "refridgerator", "television", "paper",
    "towel", "shower curtain", "box", "whiteboard", "person", "night stand",
    "toilet", "sink", "lamp", "bathtub", "bag", "otherstructure",
    "otherfurniture", "otherprop",
]

NYU20_CLASSES: List[str] = [
    "undefined", "wall", "floor", "cabinet", "bed", "chair", "sofa", "table",
    "door", "window", "bookshelf", "picture", "counter", "desk", "curtain",
    "refridgerator", "shower curtain", "toilet", "sink", "bathtub",
    "otherfurniture",
]


def _golden_palette(n: int, seed_hue: float = 0.0) -> np.ndarray:
    """Deterministic, well-separated color palette (golden-ratio hue walk)."""
    phi = 0.61803398875
    colors = np.zeros((n, 3), np.uint8)
    h = seed_hue
    for i in range(n):
        if i == 0:
            colors[i] = (0, 0, 0)  # class 0: black
            continue
        h = (h + phi) % 1.0
        s = 0.55 + 0.35 * ((i * 3) % 7) / 7.0
        v = 0.65 + 0.3 * ((i * 5) % 5) / 5.0
        r, g, b = colorsys.hsv_to_rgb(h, s, v)
        colors[i] = (int(r * 255), int(g * 255), int(b * 255))
    return colors


def get_mapping(n: int = 256) -> np.ndarray:
    """256-entry id -> RGB map used for coloring semantic meshes
    (reference utils/mapping.py:48-75)."""
    return _golden_palette(n)


def replica_color_palette() -> np.ndarray:
    return _golden_palette(len(REPLICA_CLASSES))


def nyu40_color_palette() -> np.ndarray:
    return _golden_palette(len(NYU40_CLASSES), seed_hue=0.31)


def scannet_to_nyu40_map(tsv_path: Optional[str] = None,
                         max_raw_id: int = 1400) -> np.ndarray:
    """Raw ScanNet label id -> NYU-40 id lookup table, built from the
    official ``scannetv2-labels.combined.tsv`` (columns ``id`` and
    ``nyu40id``; reference utils/mapping.py:252-277). Ids without a mapping
    (or with no tsv available) map to 0."""
    lut = np.zeros(max_raw_id + 1, np.int32)
    if tsv_path is None or not os.path.exists(tsv_path):
        return lut
    with open(tsv_path, newline="") as f:
        reader = csv.DictReader(f, delimiter="\t")
        for row in reader:
            try:
                raw = int(row["id"])
                nyu = int(row["nyu40id"])
            except (KeyError, ValueError):
                continue
            if 0 <= raw <= max_raw_id:
                lut[raw] = nyu
    return lut


# NYU-40 -> NYU-20 benchmark subset (the 20 ScanNet benchmark classes, in
# benchmark order; reference lists/scannet + utils/mapping NYU-20 usage).
_NYU40_TO_NYU20 = {
    1: 1, 2: 2, 3: 3, 4: 4, 5: 5, 6: 6, 7: 7, 8: 8, 9: 9, 10: 10, 11: 11,
    12: 12, 14: 13, 16: 14, 24: 15, 28: 16, 33: 17, 34: 18, 36: 19, 39: 20,
}


def nyu40_to_nyu20_map() -> np.ndarray:
    lut = np.zeros(41, np.int32)
    for k, v in _NYU40_TO_NYU20.items():
        lut[k] = v
    return lut
