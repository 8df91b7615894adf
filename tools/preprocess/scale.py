#!/usr/bin/env python
"""Step 1: normalise meshes into the unit cube [-0.5, 0.5]^3 with padding.

Port of reference deps/mesh-fusion/1_scale.py. Writes the applied transform
alongside so later steps can undo it.

Usage: python tools/preprocess/scale.py --in_dir meshes/ --out_dir scaled/
       [--padding 0.1]
"""

import argparse
import glob
import json
import os

import numpy as np

from common import load_mesh, save_mesh


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--in_dir", required=True)
    ap.add_argument("--out_dir", required=True)
    ap.add_argument("--padding", type=float, default=0.1)
    args = ap.parse_args()
    os.makedirs(args.out_dir, exist_ok=True)

    files = sorted(sum((glob.glob(os.path.join(args.in_dir, p))
                        for p in ("*.off", "*.ply", "*.obj")), []))
    for path in files:
        verts, faces = load_mesh(path)
        lo = verts.min(axis=0)
        hi = verts.max(axis=0)
        center = (lo + hi) / 2
        scale = float((hi - lo).max()) / (1.0 - args.padding)
        verts = (verts - center) / scale
        name = os.path.splitext(os.path.basename(path))[0]
        save_mesh(os.path.join(args.out_dir, name + ".off"), verts, faces)
        with open(os.path.join(args.out_dir, name + ".json"), "w") as fj:
            json.dump({"center": center.tolist(), "scale": scale}, fj)
        print(f"{name}: scale {scale:.4f}")


if __name__ == "__main__":
    main()
