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


# ---- detection_cvpr_2019 TP errors + NDS (fallback protocol) ----------------

from radardistill_tpu.data.nuscenes.eval_bridge import detection_metrics


def boxes9_at(rows):
    """rows: (x, y, yaw, dx, dy, dz, vx, vy)."""
    b = np.zeros((len(rows), 9), np.float32)
    for i, (x, y, yaw, dx, dy, dz, vx, vy) in enumerate(rows):
        b[i] = [x, y, 0, dx, dy, dz, yaw, vx, vy]
    return b


def test_perfect_predictions_nds_one():
    gt = boxes9_at([(0, 0, 0.3, 2, 2, 2, 1, 0), (10, 10, -1.0, 3, 2, 2, 0, 0)])
    names = np.array(["car", "car"])
    m = detection_metrics([gt], [names], [gt.copy()],
                          [np.array([0.9, 0.8])], [names], ["car"])
    assert m["mean_ap"] > 0.99
    for v in m["tp_errors"].values():
        assert v < 1e-6, m["tp_errors"]
    assert m["nd_score"] > 0.99


def test_tp_errors_hand_computed():
    """One GT at origin, one det 1 m off, half-scale, yaw off by pi/4,
    velocity off by (2, 0): every TP error is analytic."""
    gt = boxes9_at([(0, 0, 0.0, 2, 2, 2, 0, 0)])
    det = boxes9_at([(1.0, 0, np.pi / 4, 1, 1, 1, 2.0, 0)])
    m = detection_metrics([gt], [np.array(["car"])], [det],
                          [np.array([0.9])], [np.array(["car"])], ["car"])
    # matched at 2m and 4m only (dist 1.0 not < 1.0) -> mAP = 0.5
    assert abs(m["mean_ap"] - 0.5) < 1e-6
    e = m["tp_errors"]
    assert abs(e["trans_err"] - 1.0) < 1e-6
    # scale_iou of aligned (2,2,2) vs (1,1,1): 1 / (8 + 1 - 1) = 0.125
    assert abs(e["scale_err"] - (1 - 0.125)) < 1e-6
    assert abs(e["orient_err"] - np.pi / 4) < 1e-6
    assert abs(e["vel_err"] - 2.0) < 1e-6
    # attr heuristic: gt static car -> parked; det moving (2 m/s) -> moving
    assert abs(e["attr_err"] - 1.0) < 1e-6
    # NDS = (5*0.5 + (1-min(1,1.0)) + (1-0.875) + (1-pi/4) + 0 + 0) / 10
    expect = (5 * 0.5 + 0.0 + 0.125 + (1 - np.pi / 4) + 0.0 + 0.0) / 10
    assert abs(m["nd_score"] - expect) < 1e-6


def test_tp_class_exclusions():
    """barrier: no AVE/AAE; traffic_cone: no AOE/AVE/AAE (devkit rules)."""
    gt_b = boxes9_at([(0, 0, 0.0, 2, 2, 2, 0, 0)])
    m = detection_metrics(
        [gt_b], [np.array(["barrier"])], [gt_b.copy()],
        [np.array([0.9])], [np.array(["barrier"])], ["barrier", "traffic_cone"],
    )
    # vel/attr undefined for barrier (and no cone GT) -> default err 1.0
    assert m["tp_errors"]["vel_err"] == 1.0
    assert m["tp_errors"]["attr_err"] == 1.0
    assert m["tp_errors"]["trans_err"] < 1e-6
    # barrier yaw period is pi: a pi rotation is a perfect orientation match
    det_rot = gt_b.copy()
    det_rot[0, 6] = np.pi
    m2 = detection_metrics(
        [gt_b], [np.array(["barrier"])], [det_rot],
        [np.array([0.9])], [np.array(["barrier"])], ["barrier"],
    )
    assert m2["tp_errors"]["orient_err"] < 1e-6
