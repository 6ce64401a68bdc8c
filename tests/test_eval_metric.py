"""Internal center-distance AP sanity (eval_bridge.center_distance_ap)."""

import numpy as np

from radardistill_tpu.data.nuscenes.eval_bridge import center_distance_ap


def boxes_at(centers):
    b = np.zeros((len(centers), 7), np.float32)
    b[:, :2] = centers
    b[:, 3:6] = 2.0
    return b


def test_perfect_predictions_ap_one():
    gt = boxes_at([(0, 0), (10, 10), (-5, 8)])
    names = np.array(["car"] * 3)
    aps = center_distance_ap([gt], [names], [gt.copy()], [np.array([0.9, 0.8, 0.7])],
                             [names], ["car"])
    for t, v in aps["car"].items():
        assert v > 0.99, (t, v)


def test_all_missed_ap_zero():
    gt = boxes_at([(0, 0)])
    det = boxes_at([(30, 30)])
    aps = center_distance_ap([gt], [np.array(["car"])], [det], [np.array([0.9])],
                             [np.array(["car"])], ["car"])
    for v in aps["car"].values():
        assert v == 0.0


def test_distance_threshold_separates():
    gt = boxes_at([(0, 0)])
    det = boxes_at([(1.5, 0)])  # 1.5 m off: hits 2m/4m, misses 0.5m/1m
    aps = center_distance_ap([gt], [np.array(["car"])], [det], [np.array([0.9])],
                             [np.array(["car"])], ["car"])
    assert aps["car"][0.5] == 0.0 and aps["car"][1.0] == 0.0
    assert aps["car"][2.0] > 0.99 and aps["car"][4.0] > 0.99


def test_false_positives_lower_precision():
    gt = boxes_at([(0, 0)])
    det = boxes_at([(0, 0), (20, 20), (30, 30)])
    scores = np.array([0.5, 0.9, 0.8])  # FPs score higher
    aps = center_distance_ap([gt], [np.array(["car"])], [det], [scores],
                             [np.array(["car"] * 3)], ["car"])
    # recall reaches 1 but precision at that recall is 1/3 -> clipped AP well below 1
    assert 0.0 < aps["car"][2.0] < 0.5
