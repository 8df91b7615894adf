#!/usr/bin/env python
"""Step 3: mesh simplification by vertex clustering.

Replaces reference deps/mesh-fusion/3_simplify.py (which shells out to
meshlabserver quadric decimation, :56-61 -- not available on TPU hosts)
with grid-based vertex clustering: vertices are snapped to a target-size
grid, merged, and degenerate faces dropped. Coarser but dependency-free.

Usage: python tools/preprocess/simplify.py --in_dir fused/ --out_dir simple/
       [--cluster 0.01]
"""

import argparse
import glob
import os

import numpy as np

from common import load_mesh, save_mesh


def simplify(verts: np.ndarray, faces: np.ndarray, cluster: float):
    keys = np.floor(verts / cluster).astype(np.int64)
    lin = (keys[:, 0] * 73856093) ^ (keys[:, 1] * 19349663) \
        ^ (keys[:, 2] * 83492791)
    uniq, inverse = np.unique(lin, return_inverse=True)
    new_verts = np.zeros((len(uniq), 3), np.float64)
    counts = np.zeros(len(uniq), np.int64)
    np.add.at(new_verts, inverse, verts)
    np.add.at(counts, inverse, 1)
    new_verts /= counts[:, None]

    new_faces = inverse[faces]
    good = ((new_faces[:, 0] != new_faces[:, 1])
            & (new_faces[:, 1] != new_faces[:, 2])
            & (new_faces[:, 0] != new_faces[:, 2]))
    return new_verts.astype(np.float32), new_faces[good].astype(np.int32)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--in_dir", required=True)
    ap.add_argument("--out_dir", required=True)
    ap.add_argument("--cluster", type=float, default=0.01)
    args = ap.parse_args()
    os.makedirs(args.out_dir, exist_ok=True)

    for path in sorted(glob.glob(os.path.join(args.in_dir, "*.off"))):
        name = os.path.splitext(os.path.basename(path))[0]
        verts, faces = load_mesh(path)
        sv, sf = simplify(verts, faces, args.cluster)
        save_mesh(os.path.join(args.out_dir, name + ".off"), sv, sf)
        print(f"{name}: {len(verts)}->{len(sv)} verts, "
              f"{len(faces)}->{len(sf)} faces")


if __name__ == "__main__":
    main()
