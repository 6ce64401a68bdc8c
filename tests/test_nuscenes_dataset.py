"""NuScenes dataset loaders exercised against a synthetic on-disk fixture:
fake lidar .bin sweeps, radar .pcd files (via the tested writer), and an
info pkl with known sensor2lidar transforms — verifies sweep concatenation,
ego-motion transform application, and radar velocity/motion compensation
(nuscenes_dataset_distill.py:86-119, 240-278 semantics)."""

import pickle

import numpy as np
import pytest

from radardistill_tpu.config import ConfigDict
from radardistill_tpu.data.nuscenes.dataset import (
    NuScenesDataset,
    NuScenesDatasetDistill,
    NuScenesDatasetRadar,
    NuScenesDatasetRadarTest,
)
from tests.test_pcd import write_pcd, FIELDS


def rot_z(a):
    c, s = np.cos(a), np.sin(a)
    return np.array([[c, -s, 0], [s, c, 0], [0, 0, 1]])


def build_fixture(root, n_samples=2):
    (root / "samples").mkdir(parents=True, exist_ok=True)
    (root / "sweeps").mkdir(exist_ok=True)
    rng = np.random.RandomState(0)
    infos = []
    for i in range(n_samples):
        # key lidar frame: 40 points (x,y,z,intensity,ring)
        lidar = rng.uniform(-10, 10, (40, 5)).astype(np.float32)
        lpath = f"samples/lidar_{i}.bin"
        lidar.tofile(root / lpath)

        # one sweep, translated by a known transform
        sweep = rng.uniform(-10, 10, (30, 5)).astype(np.float32)
        spath = f"sweeps/lidar_sweep_{i}.bin"
        sweep.tofile(root / spath)
        tm = np.eye(4)
        tm[:3, 3] = [1.0, 2.0, 0.0]

        # radar: one channel, 2 sweeps with known rotation + timestamps
        radars = {}
        rpts = np.zeros((5,), object)
        ch_sweeps = []
        for k in range(2):
            rows_path = f"samples/radar_{i}_{k}.pcd"
            rows = write_pcd(root / rows_path, n=6, seed=10 * i + k)
            ch_sweeps.append({
                "data_path": rows_path,
                "timestamp": 1_000_000 * (10 - k),  # sweep k=1 is 1s older
                "sensor2lidar_rotation": rot_z(np.pi / 2),
                "sensor2lidar_translation": np.array([0.5, 0.0, 0.0]),
                "_rows": rows,
            })
        radars["RADAR_FRONT"] = ch_sweeps

        boxes = np.zeros((3, 9), np.float32)
        boxes[:, 0:2] = rng.uniform(-8, 8, (3, 2))
        boxes[:, 3:6] = 2.0
        infos.append({
            "lidar_path": lpath,
            "token": f"tok{i}",
            "sweeps": [{"lidar_path": spath, "transform_matrix": tm, "time_lag": 0.45}],
            "radars": {k: [dict((a, b) for a, b in s.items() if a != "_rows") for s in v]
                       for k, v in radars.items()},
            "gt_boxes": boxes,
            "gt_names": np.array(["car", "truck", "car"]),
            "num_lidar_pts": np.array([10, 10, 10]),
            "num_radar_pts": np.array([2, 0, 1]),
        })
        if i == 0:
            build_fixture.radar_rows = radars["RADAR_FRONT"]
    with open(root / "infos_train.pkl", "wb") as f:
        pickle.dump(infos, f)
    with open(root / "infos_val.pkl", "wb") as f:
        pickle.dump(infos, f)
    return infos


def dataset_cfg(root):
    return ConfigDict(
        DATASET="NuScenesDataset_Distill",
        DATA_PATH=str(root),
        VERSION="v1.0-mini",
        MAX_SWEEPS=2,
        PRED_VELOCITY=True,
        INFO_PATH={"train": ["infos_train.pkl"], "test": ["infos_val.pkl"]},
        POINT_CLOUD_RANGE=[-54.0, -54.0, -5.0, 54.0, 54.0, 3.0],
        POINT_FEATURE_ENCODING={},
        DATA_PROCESSOR=[
            {"NAME": "mask_points_and_boxes_outside_range", "REMOVE_OUTSIDE_BOXES": True},
            {"NAME": "transform_points_to_voxels_placeholder", "VOXEL_SIZE": [0.075, 0.075, 0.2]},
        ],
    )


CLASSES = ["car", "truck"]


def test_distill_dataset_lidar_and_radar(tmp_path):
    build_fixture(tmp_path)
    ds = NuScenesDatasetDistill(dataset_cfg(tmp_path), CLASSES, training=False,
                                root_path=tmp_path)
    assert len(ds) == 2
    item = ds[0]
    # lidar: key frame (40) + sweep (30, minus ego-radius removals), 5 feats (xyzi + time)
    assert item["points"].shape[1] == 5
    assert 40 < len(item["points"]) <= 70
    # key-frame points have time 0; sweep points time_lag 0.45
    times = np.unique(item["points"][:, 4])
    assert all(np.isclose(t, 0.0) or np.isclose(t, 0.45) for t in times)

    # radar: 2 sweeps x 6 pts, 6 feats
    assert item["radar_points"].shape[1] == 6
    assert len(item["radar_points"]) <= 12

    # verify radar geometry for sweep 0 of sample 0 (rotation pi/2 + tr):
    rows = build_fixture.radar_rows[0]["_rows"]
    raw = ds.get_radar_with_sweeps(0, max_sweeps=2)
    # first 6 rows correspond to sweep 0 (time_diff = 0 -> no motion comp)
    x, y = rows["x"], rows["y"]
    want_x = -y + 0.5  # rot z by pi/2: (x,y)->(-y,x), then translate +0.5 in x
    want_y = x
    np.testing.assert_allclose(raw[:6, 0], want_x, atol=1e-4)
    np.testing.assert_allclose(raw[:6, 1], want_y, atol=1e-4)
    # velocities rotated the same way
    np.testing.assert_allclose(raw[:6, 4], -rows["vy_comp"], atol=1e-4)
    np.testing.assert_allclose(raw[:6, 5], rows["vx_comp"], atol=1e-4)
    # sweep 1 is 1s older: positions advanced by velo * 1s
    rows1 = build_fixture.radar_rows[1]["_rows"]
    vx1 = -rows1["vy_comp"]
    np.testing.assert_allclose(raw[6:12, 0], -rows1["y"] + 0.5 + vx1 * 1.0, atol=1e-3)

    # gt filtering by FILTER_MIN_POINTS_IN_GT absent -> all boxes kept, only
    # configured classes enter gt_boxes with class ids appended
    assert item["gt_boxes"].shape[1] == 10


def test_radar_only_variants(tmp_path):
    build_fixture(tmp_path)
    cfg = dataset_cfg(tmp_path)
    ds = NuScenesDatasetRadar(cfg, CLASSES, training=False, root_path=tmp_path)
    item = ds[0]
    assert "points" not in item
    assert item["radar_points"].shape[1] == 6

    ds_t = NuScenesDatasetRadarTest(cfg, CLASSES, training=False, root_path=tmp_path)
    item_t = ds_t[0]
    # num_radar_pts filter: boxes with 0 radar points dropped (3 -> 2)
    assert len(item_t["gt_boxes"]) == 2

    ds_l = NuScenesDataset(cfg, CLASSES, training=False, root_path=tmp_path)
    item_l = ds_l[0]
    assert "radar_points" not in item_l
    assert item_l["points"].shape[1] == 5
