"""Dataloader: batching/wrapping, per-process slicing, worker pool."""

import numpy as np

from radardistill_tpu.config import ConfigDict
from radardistill_tpu.data.loader import build_dataloader

SMOKE_DATA_CFG = ConfigDict(
    DATASET="SyntheticDataset",
    DATA_PATH=".",
    POINT_CLOUD_RANGE=[-9.6, -9.6, -5.0, 9.6, 9.6, 3.0],
    SYN_NUM_LIDAR=200,
    SYN_NUM_RADAR=50,
    SYN_NUM_BOXES=4,
    CAPACITIES={"MAX_LIDAR_POINTS": 256, "MAX_RADAR_POINTS": 64, "NUM_MAX_OBJS": 8},
    POINT_FEATURE_ENCODING={},
    DATA_PROCESSOR=[
        {"NAME": "mask_points_and_boxes_outside_range", "REMOVE_OUTSIDE_BOXES": True},
        {"NAME": "transform_points_to_voxels_placeholder", "VOXEL_SIZE": [0.075, 0.075, 0.2]},
    ],
)
CLASSES = ["car", "truck", "bus", "pedestrian"]


def test_eval_loader_wraps_last_batch():
    ds, loader = build_dataloader(SMOKE_DATA_CFG, CLASSES, batch_size=3, training=False)
    batches = list(loader)
    assert len(batches) == 3  # 8 samples / bs3 -> ceil = 3
    for batch, host in batches:
        assert batch["points"].shape == (3, 256, 5)
        assert batch["radar_points"].shape == (3, 64, 6)


def test_train_loader_drops_last_and_shuffles():
    ds, loader = build_dataloader(SMOKE_DATA_CFG, CLASSES, batch_size=3, training=True, seed=1)
    assert len(loader) == 2  # drop_last
    loader.set_epoch(0)
    first0 = next(iter(loader))[1]["frame_id"]
    loader.set_epoch(1)
    first1 = next(iter(loader))[1]["frame_id"]
    assert first0 != first1  # epoch reshuffle


def test_process_slicing_partitions_dataset():
    ds, l0 = build_dataloader(SMOKE_DATA_CFG, CLASSES, batch_size=2, training=False,
                              process_index=0, process_count=2)
    _, l1 = build_dataloader(SMOKE_DATA_CFG, CLASSES, batch_size=2, training=False,
                             process_index=1, process_count=2)
    ids0 = [fid for _, h in l0 for fid in h["frame_id"]]
    ids1 = [fid for _, h in l1 for fid in h["frame_id"]]
    assert set(ids0).isdisjoint(ids1)
    assert len(set(ids0) | set(ids1)) == 8


def test_worker_loader_matches_serial():
    ds, serial = build_dataloader(SMOKE_DATA_CFG, CLASSES, batch_size=2, training=False)
    _, workers = build_dataloader(SMOKE_DATA_CFG, CLASSES, batch_size=2, training=False,
                                  workers=2)
    for (b_s, h_s), (b_w, h_w) in zip(serial, workers):
        assert h_s["frame_id"] == h_w["frame_id"]
        np.testing.assert_allclose(b_s["points"], b_w["points"])


def test_set_start_iter_skips_batches():
    """Mid-epoch resume: the loader must skip the first n batches at the
    index level (serial and worker paths), then reset for later epochs."""
    ds, loader = build_dataloader(SMOKE_DATA_CFG, CLASSES, batch_size=2, training=False)
    full = [h["frame_id"] for _, h in loader]
    loader.set_start_iter(2)
    skipped = [h["frame_id"] for _, h in loader]
    assert skipped == full[2:]
    # one-shot: the following epoch is complete again
    assert [h["frame_id"] for _, h in loader] == full

    loader.workers = 2
    loader.set_start_iter(3)
    skipped_w = [h["frame_id"] for _, h in loader]
    assert skipped_w == full[3:]
    loader.workers = 0
