"""BEV similarity analytics: footprint masks, pooled features, CKA math,
engine accumulation + CSV output."""

import numpy as np

from radardistill_tpu.utils.similarity import (
    BEVSimilarityEngine,
    box_pixel_masks,
    cka_linear,
    cka_rbf,
    cosine_matrix,
    extract_box_features,
    world_to_bev_rc,
)

PCR = [-8.0, -8.0, -5.0, 8.0, 8.0, 3.0]


def test_world_to_bev_rc():
    r, c = world_to_bev_rc(0.0, 0.0, PCR, 16, 16)
    assert abs(r - 8.0) < 1e-6 and abs(c - 8.0) < 1e-6
    r, c = world_to_bev_rc(-8.0, 8.0, PCR, 16, 16)
    assert c == 0.0 and r == 15.0  # clipped


def test_box_pixel_masks():
    H = W = 16  # 1 m/pixel
    boxes = np.array([
        [0, 0, 0, 4, 2, 1, 0.0],          # 4x2 axis-aligned at origin
        [0, 0, 0, 4, 2, 1, np.pi / 2],    # same, rotated 90° -> 2x4
    ], np.float32)
    m = box_pixel_masks(boxes, PCR, H, W)
    assert m.shape == (2, H, W)
    assert m[0].sum() == 8   # 4x2 m footprint = 8 pixels
    assert m[1].sum() == 8
    ys0, xs0 = np.nonzero(m[0])
    ys1, xs1 = np.nonzero(m[1])
    assert np.ptp(xs0) == 3 and np.ptp(ys0) == 1  # wide in x
    assert np.ptp(xs1) == 1 and np.ptp(ys1) == 3  # wide in y after rotation


def test_extract_box_features_poolings():
    H = W = 16
    bev = np.zeros((H, W, 3), np.float32)
    bev[8, 8] = [1, 2, 3]
    bev[8, 9] = [5, 0, 0]
    boxes = np.array([[0.5, 0.5, 0, 2, 2, 1, 0.0]], np.float32)
    center = extract_box_features(bev, boxes, PCR, "center")
    avg = extract_box_features(bev, boxes, PCR, "avg")
    mx = extract_box_features(bev, boxes, PCR, "max")
    # center pixel of (0.5, 0.5) world -> row 8, col 8
    np.testing.assert_allclose(center[0], [1, 2, 3])
    assert mx[0][0] == 5.0
    assert 0 < avg[0][0] < 5.0


def test_cosine_and_cka():
    rng = np.random.RandomState(0)
    f = rng.randn(4, 16)
    S = cosine_matrix(f)
    np.testing.assert_allclose(np.diag(S), 1, atol=1e-12)
    # hand-check one entry
    c01 = f[0] @ f[1] / (np.linalg.norm(f[0]) * np.linalg.norm(f[1]))
    np.testing.assert_allclose(S[0, 1], c01)

    # linear CKA on 1-row matrices == cosine
    np.testing.assert_allclose(cka_linear(f[0:1], f[1:2]), c01, rtol=1e-10)
    # CKA is scale-invariant and 1 on self
    x, y = rng.randn(6, 8), rng.randn(6, 8)
    np.testing.assert_allclose(cka_linear(x, x), 1.0, rtol=1e-10)
    np.testing.assert_allclose(cka_linear(3.7 * x, y), cka_linear(x, y), rtol=1e-10)
    assert 0 < cka_rbf(x, x) <= 1.0 + 1e-9
    # degenerate 1-row rbf must be finite (reference NaNs here)
    assert np.isfinite(cka_rbf(f[0:1], f[1:2]))


def test_engine_accumulate_and_save(tmp_path):
    rng = np.random.RandomState(1)
    H = W = 16
    bev = rng.randn(2, H, W, 8).astype(np.float32)
    gt = np.zeros((2, 4, 8), np.float32)
    gt[0, 0] = [0, 0, 0, 2, 2, 1, 0, 1]
    gt[0, 1] = [3, 3, 0, 2, 2, 1, 0, 2]
    gt[0, 2] = [-3, -3, 0, 2, 2, 1, 0, 1]
    gt[1, 0] = [1, 1, 0, 2, 2, 1, 0, 2]  # single instance -> skipped
    eng = BEVSimilarityEngine("feat", "spatial_features_2d", ["car", "ped"], PCR)
    eng.process_batch({"spatial_features_2d": bev}, {"gt_boxes": gt})
    summ = eng.summary()
    assert summ["counts"].sum() == 6  # 3 instances -> 3*2 ordered pairs
    assert np.all(np.abs(summ["cosine"]) <= 1 + 1e-9)
    out_dir = eng.save(tmp_path)
    import os
    for k in ("cosine", "cka_linear", "cka_rbf", "counts"):
        f = os.path.join(out_dir, f"{k}.csv")
        assert os.path.exists(f)
        lines = open(f).read().strip().split("\n")
        assert lines[0] == ",car,ped" and len(lines) == 3
