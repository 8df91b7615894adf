#!/usr/bin/env python
"""Generate Replica train/val/test scene-list files.

Equivalent of reference lists/replica/create_split_lists.py:1-80: walks a
Replica root containing <scene>/<trajectory>/ modality dirs and writes list
files with one 'scene/trajectory' entry per line, split by scene.

Usage: python create_split_lists.py --root <replica_root> --out .
       [--train 0.5 --val 0.25]
"""

import argparse
import glob
import os
import random


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--root", required=True)
    ap.add_argument("--out", default=".")
    ap.add_argument("--train", type=float, default=0.5)
    ap.add_argument("--val", type=float, default=0.25)
    ap.add_argument("--seed", type=int, default=0)
    args = ap.parse_args()

    scenes = sorted(
        d for d in os.listdir(args.root)
        if os.path.isdir(os.path.join(args.root, d)))
    rng = random.Random(args.seed)
    rng.shuffle(scenes)
    n = len(scenes)
    n_train = int(n * args.train)
    n_val = int(n * args.val)
    splits = {
        "train": scenes[:n_train],
        "val": scenes[n_train:n_train + n_val],
        "test": scenes[n_train + n_val:],
    }
    for split, ss in splits.items():
        lines = []
        for s in sorted(ss):
            for traj in sorted(glob.glob(os.path.join(args.root, s, "*"))):
                if os.path.isdir(os.path.join(traj, "left_rgb")):
                    lines.append(f"{s}/{os.path.basename(traj)}")
        path = os.path.join(args.out, f"{split}.txt")
        with open(path, "w") as f:
            f.write("\n".join(lines) + "\n")
        print(f"{split}: {len(ss)} scenes, {len(lines)} trajectories")


if __name__ == "__main__":
    main()
