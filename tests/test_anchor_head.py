"""Anchor head family: coder round-trip vs reference formulas, nearest-BEV
IoU, target assignment semantics, losses, head module shapes."""

import numpy as np
import jax
import jax.numpy as jnp

from radardistill_tpu.models.anchor_head import (
    AnchorHeadSingle,
    ResidualCoder,
    anchor_head_loss,
    assign_anchor_targets,
    assign_targets_single,
    generate_anchors,
    nearest_bev_iou,
)
from tests.test_geometry import random_boxes


def test_residual_coder_roundtrip():
    rng = np.random.RandomState(0)
    boxes = jnp.asarray(random_boxes(20, seed=1))
    anchors = jnp.asarray(random_boxes(20, seed=2))
    for sincos in (False, True):
        coder = ResidualCoder(encode_angle_by_sincos=sincos)
        enc = coder.encode(boxes, anchors)
        dec = coder.decode(enc, anchors)
        np.testing.assert_allclose(np.asarray(dec[:, :6]), np.asarray(boxes[:, :6]),
                                   rtol=1e-4, atol=1e-4)
        # heading equal up to 2π (sincos decodes via atan2)
        dh = np.asarray(jnp.mod(dec[:, 6] - boxes[:, 6] + np.pi, 2 * np.pi) - np.pi)
        np.testing.assert_allclose(dh, 0, atol=1e-4)


def test_residual_coder_matches_reference_formula():
    # transcription of box_coder_utils.ResidualCoder.encode_torch
    b = random_boxes(8, seed=3).astype(np.float64)
    a = random_boxes(8, seed=4).astype(np.float64)
    coder = ResidualCoder()
    got = np.asarray(coder.encode(jnp.asarray(b, jnp.float32), jnp.asarray(a, jnp.float32)))
    diag = np.sqrt(a[:, 3] ** 2 + a[:, 4] ** 2)
    want = np.stack([
        (b[:, 0] - a[:, 0]) / diag, (b[:, 1] - a[:, 1]) / diag,
        (b[:, 2] - a[:, 2]) / a[:, 5],
        np.log(b[:, 3] / a[:, 3]), np.log(b[:, 4] / a[:, 4]), np.log(b[:, 5] / a[:, 5]),
        b[:, 6] - a[:, 6],
    ], 1)
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-4)


def test_nearest_bev_iou_axis_swap():
    # a box rotated ~π/2 swaps extents before the axis-aligned IoU
    a = jnp.asarray([[0, 0, 0, 4.0, 2.0, 1, 0.0]])
    b_rot = jnp.asarray([[0, 0, 0, 2.0, 4.0, 1, np.pi / 2]])
    iou = float(nearest_bev_iou(a, b_rot)[0, 0])
    assert iou > 0.99  # after snapping, identical footprints


def test_assign_targets_semantics():
    coder = ResidualCoder()
    anchors = jnp.asarray([
        [0, 0, 0, 4, 2, 1.5, 0],      # exactly on gt 0
        [10, 10, 0, 4, 2, 1.5, 0],    # background
        [0.5, 0, 0, 4, 2, 1.5, 0],    # partial overlap (ignore band)
    ], jnp.float32)
    gt = jnp.asarray([[0, 0, 0, 4, 2, 1.5, 0]], jnp.float32)
    labels, reg = assign_targets_single(
        anchors, gt, jnp.asarray([2]), jnp.asarray([True]), coder,
        matched_threshold=0.9, unmatched_threshold=0.5,
    )
    labels = np.asarray(labels)
    assert labels[0] == 2        # matched -> class id
    assert labels[1] == 0        # background
    assert labels[2] == -1       # between thresholds -> ignore
    np.testing.assert_allclose(np.asarray(reg[0]), 0, atol=1e-6)  # perfect match
    # no GT at all -> everything background
    labels2, _ = assign_targets_single(
        anchors, gt, jnp.asarray([2]), jnp.asarray([False]), coder, 0.9, 0.5
    )
    assert np.all(np.asarray(labels2) == 0)


def test_generate_anchors_and_batched_assignment():
    cfgs = [
        {"anchor_sizes": [[4.6, 1.9, 1.7]], "anchor_rotations": [0, 1.57],
         "anchor_bottom_heights": [-1.8], "align_center": True},
        {"anchor_sizes": [[0.8, 0.6, 1.7]], "anchor_rotations": [0, 1.57],
         "anchor_bottom_heights": [-1.8], "align_center": True},
    ]
    anchors = generate_anchors(cfgs, (32, 32), [-8, -8, -5, 8, 8, 3], feature_map_stride=2)
    assert anchors[0].shape == (16, 16, 2, 7)

    gt = np.zeros((2, 4, 8), np.float32)
    gt[0, 0] = [0, 0, -1, 4.6, 1.9, 1.7, 0, 1]   # class 1 (car)
    gt[0, 1] = [3, 3, -1, 0.8, 0.6, 1.7, 0, 2]   # class 2
    coder = ResidualCoder()
    targets = assign_anchor_targets(
        anchors, jnp.asarray(gt), class_ids=[1, 2], coder=coder,
        matched_thr=[0.55, 0.4], unmatched_thr=[0.4, 0.25],
    )
    a_total = 16 * 16 * 4
    assert targets["box_cls_labels"].shape == (2, a_total)
    labels0 = np.asarray(targets["box_cls_labels"][0])
    assert (labels0 == 1).sum() >= 1      # car anchors matched
    assert (labels0 == 2).sum() >= 1      # pedestrian-ish anchors matched
    assert np.all(np.asarray(targets["box_cls_labels"][1]) == 0)  # no GT sample


def test_decode_anchor_predictions():
    from radardistill_tpu.models.anchor_head import decode_anchor_predictions

    coder = ResidualCoder()
    anchors = jnp.asarray(random_boxes(10, seed=6))
    gt = jnp.asarray(random_boxes(10, seed=7))
    enc = coder.encode(gt, anchors)
    preds = {
        "cls_preds": jnp.zeros((1, 10, 2)),
        "box_preds": enc[None],
        # force dir bin = the gt's actual bin so heading reconstructs
        "dir_cls_preds": jax.nn.one_hot(
            jnp.clip(jnp.floor(jnp.mod(gt[:, 6] - 0.78539, 2 * np.pi) / np.pi), 0, 1
                     ).astype(jnp.int32), 2)[None] * 10,
    }
    scores, boxes = decode_anchor_predictions(preds, anchors, coder)
    np.testing.assert_allclose(np.asarray(boxes[0, :, :6]), np.asarray(gt[:, :6]),
                               rtol=1e-4, atol=1e-4)
    dh = np.asarray(jnp.mod(boxes[0, :, 6] - gt[:, 6] + np.pi, 2 * np.pi) - np.pi)
    np.testing.assert_allclose(dh, 0, atol=1e-4)


def test_head_module_and_loss():
    rng = np.random.RandomState(0)
    head = AnchorHeadSingle(num_class=2, num_anchors_per_location=4, code_size=7)
    x = jnp.asarray(rng.randn(2, 8, 8, 64).astype(np.float32))
    variables = head.init(jax.random.PRNGKey(0), x, True)
    preds = head.apply(variables, x, True)
    A = 8 * 8 * 4
    assert preds["cls_preds"].shape == (2, A, 2)
    assert preds["box_preds"].shape == (2, A, 7)
    assert preds["dir_cls_preds"].shape == (2, A, 2)

    labels = jnp.zeros((2, A), jnp.int32).at[:, :5].set(1)
    targets = {
        "box_cls_labels": labels,
        "box_reg_targets": jnp.asarray(rng.randn(2, A, 7).astype(np.float32)) * 0.1,
    }
    anchors_flat = jnp.asarray(random_boxes(A, seed=5))
    loss, tb = anchor_head_loss(
        preds, targets, anchors_flat, num_class=2, coder=ResidualCoder(),
        code_weights=[1.0] * 7,
    )
    assert np.isfinite(float(loss)) and float(loss) > 0
    assert set(tb) >= {"rpn_loss_cls", "rpn_loss_loc", "rpn_loss_dir", "rpn_loss"}
    # gradients flow
    g = jax.grad(lambda v: anchor_head_loss(
        head.apply(v, x, True), targets, anchors_flat, 2, ResidualCoder(),
        code_weights=[1.0] * 7)[0])(variables)
    assert np.abs(np.asarray(jax.tree.leaves(g)[0])).max() > 0
