"""Decode + NMS path vs a torch-style transcription of
centernet_utils.decode_bbox_from_heatmap (:243-309) + per-head NMS."""

import numpy as np
import jax.numpy as jnp

from radardistill_tpu.models.center_head import HeadSpec, decode_and_nms
from tests import reference_impls as ref

CLASS_NAMES = ["car", "truck"]
HEADS = [["car"], ["truck"]]
HW = (20, 20)
VOXEL = (0.5, 0.5, 8.0)
PC = (-20.0, -20.0, -5.0, 20.0, 20.0, 3.0)
STRIDE = 4


def make_preds(seed=0, B=2):
    rng = np.random.RandomState(seed)
    H, W = HW
    n, mc = len(HEADS), 1
    preds = {
        "hm": rng.randn(B, H, W, n, mc).astype(np.float32) * 2 - 2,
        "center": rng.rand(B, H, W, n, 2).astype(np.float32),
        "center_z": rng.randn(B, H, W, n, 1).astype(np.float32),
        "dim": rng.randn(B, H, W, n, 3).astype(np.float32) * 0.3,
        "rot": rng.randn(B, H, W, n, 2).astype(np.float32),
        "vel": rng.randn(B, H, W, n, 2).astype(np.float32),
        "iou": rng.rand(B, H, W, n, 1).astype(np.float32) * 2 - 1,
    }
    return preds


def reference_decode(preds, b, h, k=30, score_thresh=0.1, rectifier=0.5):
    """numpy transcription of the reference decode for one (batch, head)."""
    H, W = HW
    hm = 1 / (1 + np.exp(-preds["hm"][b, :, :, h, 0]))  # (H, W), 1 class
    flat = hm.reshape(-1)
    order = np.argsort(-flat)[:k]
    ys, xs = order // W, order % W
    scores = flat[order]

    def g(key):
        return preds[key][b, :, :, h, :].reshape(H * W, -1)[order]

    center = g("center")
    cz = g("center_z")
    dim = np.exp(g("dim"))
    rot = g("rot")
    angle = np.arctan2(rot[:, 1], rot[:, 0])
    vel = g("vel")
    x = (xs + center[:, 0]) * STRIDE * VOXEL[0] + PC[0]
    y = (ys + center[:, 1]) * STRIDE * VOXEL[1] + PC[1]
    boxes = np.stack([x, y, cz[:, 0], dim[:, 0], dim[:, 1], dim[:, 2], angle,
                      vel[:, 0], vel[:, 1]], 1)
    mask = (
        np.all(boxes[:, :3] >= np.array([-61.2, -61.2, -10.0]), 1)
        & np.all(boxes[:, :3] <= np.array([61.2, 61.2, 10.0]), 1)
        & (scores > score_thresh)
    )
    iou_p = np.clip(g("iou")[:, 0], 0, 1)
    rect = scores ** (1 - rectifier) * iou_p ** rectifier
    return boxes, rect, mask


def test_decode_matches_reference():
    preds = make_preds()
    spec = HeadSpec(HEADS, CLASS_NAMES)
    out = decode_and_nms(
        {k: jnp.asarray(v) for k, v in preds.items()}, spec, HW, STRIDE, VOXEL, PC,
        post_center_limit_range=[-61.2, -61.2, -10.0, 61.2, 61.2, 10.0],
        k_per_head=30, score_thresh=0.1, rectifier=0.5,
        nms_thresh=0.2, nms_pre=30, nms_post=10,
    )
    for b in range(2):
        for h in range(2):
            boxes, rect_scores, valid = reference_decode(preds, b, h)
            keep_order = ref.nms_rotated(boxes[valid], rect_scores[valid], 0.2)[:10]
            want_boxes = boxes[valid][keep_order]

            sl = slice(h * 10, (h + 1) * 10)
            got_v = np.asarray(out["valid"][b])[sl]
            got_boxes = np.asarray(out["boxes"][b])[sl][got_v]
            assert len(got_boxes) == len(want_boxes), (b, h, len(got_boxes), len(want_boxes))
            np.testing.assert_allclose(got_boxes, want_boxes, rtol=1e-3, atol=1e-3)
            # labels are global 1-based
            got_labels = np.asarray(out["labels"][b])[sl][got_v]
            assert np.all(got_labels == h + 1)
