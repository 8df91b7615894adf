"""Replica / ScanNet loader tests against generated fixture trees.

Builds miniature on-disk datasets with the real directory layouts (pngs via
cv2, camera txts, sdf hdf5s, intrinsics, tsv label map) and exercises the
loaders end to end -- including a short train_fusion run on the fake
Replica data (the real-data path without any downloads).
"""

import os

import numpy as np
import pytest

cv2 = pytest.importorskip("cv2")
h5py = pytest.importorskip("h5py")

from segfusion_tpu.config import Config, load_config
from segfusion_tpu.data.replica import Replica
from segfusion_tpu.data.scannet import ScanNet


def make_replica_tree(root, scene="room_tiny", traj="1", n_frames=4,
                      res=16):
    base = os.path.join(root, scene, traj)
    for sub in ("left_rgb", "left_depth_gt", "left_depth_noise_5.0",
                "left_class30", "left_camera_matrix"):
        os.makedirs(os.path.join(base, sub), exist_ok=True)
    rng = np.random.RandomState(0)
    for i in range(n_frames):
        rgb = rng.randint(0, 255, (res, res, 3), dtype=np.uint8)
        cv2.imwrite(os.path.join(base, "left_rgb", f"{i}.png"), rgb)
        depth_mm = rng.randint(500, 3000, (res, res)).astype(np.uint16)
        cv2.imwrite(os.path.join(base, "left_depth_gt", f"{i}.png"),
                    depth_mm)
        cv2.imwrite(os.path.join(base, "left_depth_noise_5.0", f"{i}.png"),
                    depth_mm)
        sem = rng.randint(0, 30, (res, res)).astype(np.uint8)
        cv2.imwrite(os.path.join(base, "left_class30", f"{i}.png"), sem)
        pose = np.eye(4)
        pose[:3, 3] = [0.1 * i, 0, 0]
        np.savetxt(os.path.join(base, "left_camera_matrix", f"{i}.txt"),
                   pose)
    # gt sdf hdf
    sdfdir = os.path.join(root, scene, "gt_semantic_sdf")
    os.makedirs(sdfdir, exist_ok=True)
    grid = rng.uniform(-0.2, 0.2, (2, 12, 12, 12)).astype(np.float32)
    grid[1] = rng.randint(0, 30, (12, 12, 12))
    for name in ("sdf.hdf", "semantic_sdf.hdf"):
        with h5py.File(os.path.join(sdfdir, name), "w") as f:
            ds = f.create_dataset("sdf", data=grid)
            f.attrs["voxel_size"] = 0.05
            f.attrs["bbox"] = np.array([[0, 0.6], [0, 0.6], [0, 0.6]])
    # scene list
    lst = os.path.join(root, "list.txt")
    with open(lst, "w") as f:
        f.write(f"{scene}/{traj}\n")
    return lst


def replica_cfg(root, lst, res=16):
    return Config({
        "root_dir": root, "scene_list": lst, "resx": res, "resy": res,
        "pad": 2, "normalize": True, "frame_ratio": 1,
        "input": "tof_depth", "target": "depth_gt",
        "semantics": "class30", "truncation_strategy": "standard",
        "data_load_strategy": "max_depth_diversity",
        "load_scenes_at_once": 1, "init_value": 0.1,
        "semantic_grid": True, "n_classes": 30, "mode": "train",
    })


def test_replica_loader_roundtrip(tmp_path):
    root = str(tmp_path / "replica")
    lst = make_replica_tree(root)
    ds = Replica(replica_cfg(root, lst))
    assert ds.scenes == ["room_tiny"]
    assert len(ds) == 4
    s = ds[0]
    assert s["image"].shape == (16, 16, 3)
    assert s["tof_depth"].shape == (16, 16)
    assert s["mask"].dtype == bool
    assert s["semantic_gt"].max() < 30
    assert s["extrinsics"].shape == (4, 4)
    np.testing.assert_allclose(s["intrinsics"][0, 0], 8.0)  # hfov 90 at 16px
    assert s["frame_id"] == "room_tiny/1/0"
    # grid loading: truncation + padding
    grid, labels = ds.get_grid("room_tiny", 0.1, semantic_grid=True)
    assert grid.volume.shape == (16, 16, 16)  # 12 + 2*pad
    assert np.abs(grid.volume).max() <= 0.1 + 1e-6
    assert labels.volume.shape == (16, 16, 16)
    # hybrid ordering also works
    cfg = replica_cfg(root, lst)
    cfg.data_load_strategy = "hybrid"
    ds2 = Replica(cfg)
    assert len(ds2) == 4


@pytest.mark.slow
def test_replica_train_fusion_smoke(tmp_path):
    """Full train_fusion on the fixture Replica tree (real-data path)."""
    import train_fusion
    root = str(tmp_path / "replica")
    lst = make_replica_tree(root, n_frames=4)
    config = load_config(os.path.join(
        os.path.dirname(__file__), "..", "configs", "fusion",
        "synthetic_small.yaml"))
    config.SETTINGS.experiment_path = str(tmp_path / "ws")
    config.SETTINGS.eval_freq = 4
    config.DATA.dataset = "Replica"
    config.DATA.root_dir = root
    config.DATA.train_scene_list = lst
    config.DATA.val_scene_list = lst
    config.DATA.resx = 16
    config.DATA.resy = 16
    config.DATA.semantics = None
    config.DATA.semantic_grid = False
    config.TRAINING.optimization.accumulation_steps = 2
    params, stats = train_fusion.train_fusion({"comment": ""}, config)
    assert os.path.exists(os.path.join(str(tmp_path / "ws"),
                                       config.TIMESTAMP, "model",
                                       "last.ckpt"))


def make_scannet_tree(root, scene="scene0000_00", n_frames=3, res=16):
    sdir = os.path.join(root, "scans", scene)
    for sub in ("color", "depth", "label-filt", "pose", "intrinsic"):
        os.makedirs(os.path.join(sdir, sub), exist_ok=True)
    rng = np.random.RandomState(1)
    for i in range(n_frames):
        cv2.imwrite(os.path.join(sdir, "color", f"{i}.jpg"),
                    rng.randint(0, 255, (res, res, 3), dtype=np.uint8))
        cv2.imwrite(os.path.join(sdir, "depth", f"{i}.png"),
                    rng.randint(400, 4000, (res, res)).astype(np.uint16))
        cv2.imwrite(os.path.join(sdir, "label-filt", f"{i}.png"),
                    rng.randint(0, 50, (res, res)).astype(np.uint16))
        np.savetxt(os.path.join(sdir, "pose", f"{i}.txt"), np.eye(4))
    k = np.eye(4)
    k[0, 0] = k[1, 1] = 570.0
    k[0, 2], k[1, 2] = 320.0, 240.0
    np.savetxt(os.path.join(sdir, "intrinsic", "intrinsic_depth.txt"), k)
    # label mapping tsv
    tsv = os.path.join(root, "scannetv2-labels.combined.tsv")
    with open(tsv, "w") as f:
        f.write("id\traw_category\tnyu40id\n")
        for raw in range(50):
            f.write(f"{raw}\tcat{raw}\t{raw % 41}\n")
    # sdf grid
    with h5py.File(os.path.join(sdir, scene + "_sdf.hdf"), "w") as f:
        grid = np.random.RandomState(2).uniform(
            -0.2, 0.2, (2, 10, 10, 10)).astype(np.float32)
        f.create_dataset("sdf", data=grid)
        f.attrs["voxel_size"] = 0.05
        f.attrs["bbox"] = np.array([[0, .5], [0, .5], [0, .5]])
    lst = os.path.join(root, "list.txt")
    with open(lst, "w") as f:
        f.write(f"scans/{scene}\n")
    return lst


def test_scannet_loader_roundtrip(tmp_path):
    root = str(tmp_path / "scannet")
    lst = make_scannet_tree(root)
    cfg = Config({
        "root_dir": root, "scene_list": lst, "resx": 16, "resy": 16,
        "pad": 2, "normalize": True, "frame_ratio": 1,
        "input": "depth_gt", "target": "depth_gt",
        "semantics": "nyu40", "truncation_strategy": "standard",
        "init_value": 0.1, "mode": "test",
    })
    ds = ScanNet(cfg)
    assert ds.scenes == ["scene0000_00"]
    assert len(ds) == 3
    s = ds[0]
    assert s["image"].shape == (16, 16, 3)
    assert s["depth_gt"].shape == (16, 16)
    assert s["semantic_gt"].max() <= 40
    # intrinsics rescaled from 640x480 to 16x16
    np.testing.assert_allclose(s["intrinsics"][0, 0],
                               570.0 * 16 / 640, rtol=1e-6)
    grid, labels = ds.get_grid("scene0000_00", 0.1, semantic_grid=True)
    assert grid.volume.shape == (14, 14, 14)
    # benchmark 2D output
    out = str(tmp_path / "bench_out")
    ds.output_test(out, "scene0000_00/0",
                   np.zeros((16, 16), np.uint8))
    assert os.path.exists(os.path.join(out, "scene0000_00_0.png"))
