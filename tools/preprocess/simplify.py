#!/usr/bin/env python
"""Step 3: watertight-mesh simplification.

Replaces reference deps/mesh-fusion/3_simplify.py (which shells out to
meshlabserver quadric decimation, :56-61, with simplification.mlx:
TargetFaceNum 5000, QualityThr 0.5, OptimalPlacement, PreserveNormal,
AutoClean). Default method is a native QEM edge-collapse decimator with
the same contract (segfusion_tpu/native/simplify.cpp); ``--method
cluster`` keeps the dependency-free grid vertex clustering.

Usage: python tools/preprocess/simplify.py --in_dir fused/ --out_dir simple/
       [--method quadric|cluster] [--target 5000] [--cluster 0.01]
"""

import argparse
import glob
import os
import sys

import numpy as np

_HERE = os.path.dirname(os.path.abspath(__file__))
sys.path.insert(0, os.path.join(_HERE, "..", ".."))
sys.path.insert(0, _HERE)
from segfusion_tpu.native.simplify import (simplify_cluster,  # noqa: E402
                                           simplify_quadric)
from common import load_mesh, save_mesh  # noqa: E402


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--in_dir", required=True)
    ap.add_argument("--out_dir", required=True)
    ap.add_argument("--method", choices=["quadric", "cluster"],
                    default="quadric")
    ap.add_argument("--target", type=int, default=5000,
                    help="quadric: target face count "
                         "(reference simplification.mlx TargetFaceNum)")
    ap.add_argument("--quality_thr", type=float, default=0.5)
    ap.add_argument("--cluster", type=float, default=0.01)
    args = ap.parse_args()
    os.makedirs(args.out_dir, exist_ok=True)

    for path in sorted(glob.glob(os.path.join(args.in_dir, "*.off"))):
        name = os.path.splitext(os.path.basename(path))[0]
        verts, faces = load_mesh(path)
        if args.method == "quadric":
            sv, sf = simplify_quadric(verts, faces, args.target,
                                      args.quality_thr)
        else:
            sv, sf = simplify_cluster(verts, faces, args.cluster)
        save_mesh(os.path.join(args.out_dir, name + ".off"),
                  np.asarray(sv), np.asarray(sf))
        print(f"{name}: {len(verts)}->{len(sv)} verts, "
              f"{len(faces)}->{len(sf)} faces")


if __name__ == "__main__":
    main()
