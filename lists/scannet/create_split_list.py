#!/usr/bin/env python
"""Generate ScanNet train/val/test scene-list files.

Equivalent of reference lists/scannet/create_split_list.py: emits one
'scans/<scene_id>' line per scene, using the official ScanNet v2 split
files when present (scannetv2_{train,val,test}.txt in --root) or a random
split otherwise.

Usage: python create_split_list.py --root <scannet_root> --out .
"""

import argparse
import os
import random


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--root", required=True)
    ap.add_argument("--out", default=".")
    ap.add_argument("--seed", type=int, default=0)
    args = ap.parse_args()

    official = {
        s: os.path.join(args.root, f"scannetv2_{s}.txt")
        for s in ("train", "val", "test")
    }
    if all(os.path.exists(p) for p in official.values()):
        splits = {}
        for s, p in official.items():
            with open(p) as f:
                splits[s] = [ln.strip() for ln in f if ln.strip()]
    else:
        scans = sorted(os.listdir(os.path.join(args.root, "scans")))
        rng = random.Random(args.seed)
        rng.shuffle(scans)
        n = len(scans)
        splits = {"train": scans[: int(0.7 * n)],
                  "val": scans[int(0.7 * n): int(0.85 * n)],
                  "test": scans[int(0.85 * n):]}

    for split, ss in splits.items():
        sub = "scans_test" if split == "test" and os.path.isdir(
            os.path.join(args.root, "scans_test")) else "scans"
        path = os.path.join(args.out, f"{split}.txt")
        with open(path, "w") as f:
            for s in sorted(ss):
                f.write(f"{sub}/{s}\n")
        print(f"{split}: {len(ss)} scenes -> {path}")


if __name__ == "__main__":
    main()
