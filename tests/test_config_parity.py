"""Drop-in config compatibility: every config file the reference ships
(configs/fusion/*.yaml, configs/segmentation/*.yaml) must have a
same-named, loadable counterpart here whose scene-list paths resolve
(reference configs/ tree; SURVEY.md §7 stance 6)."""

import glob
import os

import pytest

from segfusion_tpu.config import get_data_config, load_config

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

# the reference's shipped config inventory (names are the contract; the
# reference tree itself is not needed at test time)
REFERENCE_CONFIGS = [
    "configs/fusion/replica_accuracy.yaml",
    "configs/fusion/replica_speed.yaml",
    "configs/fusion/scannet.yaml",
    "configs/segmentation/example.yaml",
    "configs/segmentation/replica_depth.yaml",
    "configs/segmentation/replica_multi.yaml",
    "configs/segmentation/replica_rgb.yaml",
    "configs/segmentation/scannet_multi.yaml",
]

REFERENCE_REPLICA_LISTS = [
    "lists/replica/train.txt", "lists/replica/val.txt",
    "lists/replica/test.txt", "lists/replica/train_small.txt",
    "lists/replica/val_small.txt", "lists/replica/test_small.txt",
    "lists/replica/example.txt",
]


@pytest.mark.parametrize("rel", REFERENCE_CONFIGS)
def test_reference_config_counterpart_loads(rel):
    path = os.path.join(REPO, rel)
    assert os.path.exists(path), f"missing drop-in counterpart {rel}"
    cfg = load_config(path)
    # core sections resolve through the schema
    assert cfg.DATA.dataset in ("Replica", "ScanNet")
    assert int(cfg.DATA.resx) > 0 and int(cfg.DATA.resy) > 0
    # scene-list paths must point at files that exist in-repo
    for mode in ("train", "val", "test"):
        data = get_data_config(cfg, mode)
        lst = data.scene_list
        assert lst, f"{rel}: no {mode} scene list"
        if not os.path.isabs(lst):
            lst = os.path.join(REPO, lst)
        assert os.path.exists(lst), f"{rel}: {mode} scene list {lst} missing"


def test_replica_split_lists_present_and_wellformed():
    for rel in REFERENCE_REPLICA_LISTS:
        path = os.path.join(REPO, rel)
        assert os.path.exists(path), f"missing {rel}"
        with open(path) as f:
            lines = [l.strip() for l in f if l.strip()]
        assert lines, f"{rel} is empty"
        for line in lines:
            cols = line.split(" ")
            # scene/traj/modality entries: 8 modality columns per line
            assert len(cols) == 8, f"{rel}: malformed line {line[:50]}"
            assert cols[0].count("/") == 2
    # split sizes match the reference protocol (27/12/12 trajectories)
    for rel, n in [("lists/replica/train.txt", 27),
                   ("lists/replica/val.txt", 12),
                   ("lists/replica/test.txt", 12),
                   ("lists/replica/example.txt", 1)]:
        with open(os.path.join(REPO, rel)) as f:
            assert sum(1 for l in f if l.strip()) == n


def test_scannet_split_lists_present():
    for rel in ["lists/scannet/train.txt", "lists/scannet/val.txt",
                "lists/scannet/test.txt"]:
        path = os.path.join(REPO, rel)
        assert os.path.exists(path), f"missing {rel}"
        with open(path) as f:
            first = f.readline().strip().split(" ")
        assert len(first) == 5 and first[0].startswith("scans")
