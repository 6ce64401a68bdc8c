"""Anchor-based dense head family (SECOND/PointPillars-style).

Reference: pcdet/models/dense_heads/anchor_head_single.py (:7-75),
anchor_head_template.py (:101-230 losses, sin-difference, direction bins),
target_assigner/axis_aligned_target_assigner.py (:132-200 matching),
pcdet/utils/box_coder_utils.py ResidualCoder (:5-80), box_utils.py
boxes3d_nearest_bev_iou (:328-341).

TPU formulation: anchors are a static per-class stack; target assignment is
fully vectorized over (anchors × padded GT) with padded rows masked out —
no dynamic nonzero/compaction. This head is OUTSIDE the RadarDistill path
(SURVEY §2.5) but completes the anchor model-family API surface.
"""

from __future__ import annotations

import math
from typing import Any, Dict, List, Sequence

import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn


# ---------------------------------------------------------------------------
# Box coder (ResidualCoder)
# ---------------------------------------------------------------------------


class ResidualCoder:
    """box_coder_utils.ResidualCoder — anchor-relative residual encoding."""

    def __init__(self, code_size=7, encode_angle_by_sincos=False):
        self.code_size = code_size + (1 if encode_angle_by_sincos else 0)
        self.encode_angle_by_sincos = encode_angle_by_sincos

    def encode(self, boxes, anchors):
        """(..., 7+C) x (..., 7+C) -> (..., code_size)."""
        anchors = anchors.at[..., 3:6].set(jnp.clip(anchors[..., 3:6], 1e-5))
        boxes = boxes.at[..., 3:6].set(jnp.clip(boxes[..., 3:6], 1e-5))
        xa, ya, za = anchors[..., 0], anchors[..., 1], anchors[..., 2]
        dxa, dya, dza, ra = anchors[..., 3], anchors[..., 4], anchors[..., 5], anchors[..., 6]
        xg, yg, zg = boxes[..., 0], boxes[..., 1], boxes[..., 2]
        dxg, dyg, dzg, rg = boxes[..., 3], boxes[..., 4], boxes[..., 5], boxes[..., 6]

        diag = jnp.sqrt(dxa ** 2 + dya ** 2)
        parts = [
            (xg - xa) / diag, (yg - ya) / diag, (zg - za) / dza,
            jnp.log(dxg / dxa), jnp.log(dyg / dya), jnp.log(dzg / dza),
        ]
        if self.encode_angle_by_sincos:
            parts += [jnp.cos(rg) - jnp.cos(ra), jnp.sin(rg) - jnp.sin(ra)]
        else:
            parts += [rg - ra]
        extras = boxes.shape[-1] - 7
        for c in range(extras):
            parts.append(boxes[..., 7 + c] - anchors[..., 7 + c])
        return jnp.stack(parts, axis=-1)

    def decode(self, encodings, anchors):
        xa, ya, za = anchors[..., 0], anchors[..., 1], anchors[..., 2]
        dxa, dya, dza, ra = anchors[..., 3], anchors[..., 4], anchors[..., 5], anchors[..., 6]
        diag = jnp.sqrt(dxa ** 2 + dya ** 2)
        xt, yt, zt = encodings[..., 0], encodings[..., 1], encodings[..., 2]
        dxt, dyt, dzt = encodings[..., 3], encodings[..., 4], encodings[..., 5]
        xg = xt * diag + xa
        yg = yt * diag + ya
        zg = zt * dza + za
        dxg = jnp.exp(dxt) * dxa
        dyg = jnp.exp(dyt) * dya
        dzg = jnp.exp(dzt) * dza
        if self.encode_angle_by_sincos:
            rg = jnp.arctan2(encodings[..., 7] + jnp.sin(ra), encodings[..., 6] + jnp.cos(ra))
            base = 8
        else:
            rg = encodings[..., 6] + ra
            base = 7
        parts = [xg, yg, zg, dxg, dyg, dzg, rg]
        for c in range(encodings.shape[-1] - base):
            parts.append(encodings[..., base + c] + anchors[..., 7 + c])
        return jnp.stack(parts, axis=-1)


# ---------------------------------------------------------------------------
# Anchor generation
# ---------------------------------------------------------------------------


def generate_anchors(anchor_generator_cfgs, grid_size, point_cloud_range, feature_map_stride):
    """AnchorGenerator equivalent: per class config {anchor_sizes,
    anchor_rotations, anchor_bottom_heights, align_center?} -> list of
    (H, W, n_size*n_rot, 7) float32 arrays + per-class thresholds."""
    nx, ny = grid_size[0] // feature_map_stride, grid_size[1] // feature_map_stride
    x0, y0 = point_cloud_range[0], point_cloud_range[1]
    vx = (point_cloud_range[3] - point_cloud_range[0]) / nx
    vy = (point_cloud_range[4] - point_cloud_range[1]) / ny

    out = []
    for cfg in anchor_generator_cfgs:
        sizes = np.asarray(cfg["anchor_sizes"], np.float32)          # (S, 3)
        rots = np.asarray(cfg["anchor_rotations"], np.float32)       # (R,)
        heights = np.asarray(cfg["anchor_bottom_heights"], np.float32)
        align = cfg.get("align_center", False)
        if align:
            xs = x0 + (np.arange(nx) + 0.5) * vx
            ys = y0 + (np.arange(ny) + 0.5) * vy
        else:
            xs = np.linspace(x0, point_cloud_range[3], nx, dtype=np.float32)
            ys = np.linspace(y0, point_cloud_range[4], ny, dtype=np.float32)
        gx, gy = np.meshgrid(xs, ys)                                 # (H=ny, W=nx)
        n_per = len(sizes) * len(rots)
        anchors = np.zeros((ny, nx, n_per, 7), np.float32)
        k = 0
        for si, size in enumerate(sizes):
            z_center = heights[min(si, len(heights) - 1)] + size[2] / 2
            for rot in rots:
                anchors[:, :, k, 0] = gx
                anchors[:, :, k, 1] = gy
                anchors[:, :, k, 2] = z_center
                anchors[:, :, k, 3:6] = size
                anchors[:, :, k, 6] = rot
                k += 1
        out.append(jnp.asarray(anchors))
    return out


# ---------------------------------------------------------------------------
# Axis-aligned target assignment (vectorized, padded-GT aware)
# ---------------------------------------------------------------------------


def nearest_bev_iou(boxes_a, boxes_b):
    """box_utils.boxes3d_nearest_bev_iou: snap heading to the nearest axis
    (swap dx/dy when closer to ±π/2) then axis-aligned BEV IoU."""

    def aligned(boxes):
        rot = boxes[..., 6] - jnp.floor(boxes[..., 6] / jnp.pi + 0.5) * jnp.pi  # [-pi/2, pi/2)
        swap = jnp.abs(rot) > jnp.pi / 4
        dx = jnp.where(swap, boxes[..., 4], boxes[..., 3])
        dy = jnp.where(swap, boxes[..., 3], boxes[..., 4])
        return jnp.stack(
            [boxes[..., 0] - dx / 2, boxes[..., 1] - dy / 2,
             boxes[..., 0] + dx / 2, boxes[..., 1] + dy / 2], axis=-1
        )

    a = aligned(boxes_a)[:, None]   # (N, 1, 4)
    b = aligned(boxes_b)[None, :]   # (1, M, 4)
    ix = jnp.clip(jnp.minimum(a[..., 2], b[..., 2]) - jnp.maximum(a[..., 0], b[..., 0]), 0)
    iy = jnp.clip(jnp.minimum(a[..., 3], b[..., 3]) - jnp.maximum(a[..., 1], b[..., 1]), 0)
    inter = ix * iy
    area_a = (a[..., 2] - a[..., 0]) * (a[..., 3] - a[..., 1])
    area_b = (b[..., 2] - b[..., 0]) * (b[..., 3] - b[..., 1])
    return inter / jnp.clip(area_a + area_b - inter, 1e-6)


def assign_targets_single(anchors, gt_boxes, gt_classes, gt_valid, coder,
                          matched_threshold, unmatched_threshold):
    """axis_aligned_target_assigner.assign_targets_single, vectorized.

    anchors: (A, 7); gt_boxes: (M, 7+) padded; gt_classes: (M,) 1-based;
    gt_valid: (M,) bool. Returns (labels (A,) int32 [-1 ignore/0 bg/cls fg],
    reg_targets (A, code_size), reg_weights handled by caller).
    """
    iou = nearest_bev_iou(anchors[:, :7], gt_boxes[:, :7])  # (A, M)
    iou = jnp.where(gt_valid[None, :], iou, -1.0)
    any_gt = jnp.any(gt_valid)

    a2g_idx = jnp.argmax(iou, axis=1)              # (A,)
    a2g_max = jnp.max(iou, axis=1)
    g2a_max = jnp.max(iou, axis=0)                 # (M,)
    g2a_max = jnp.where(g2a_max == 0, -1.0, g2a_max)
    # anchors achieving a GT's best overlap (force match)
    force = jnp.any((iou == g2a_max[None, :]) & gt_valid[None, :] & (g2a_max[None, :] > 0), axis=1)

    pos = a2g_max >= matched_threshold
    bg = a2g_max < unmatched_threshold

    labels = jnp.full(anchors.shape[0], -1, jnp.int32)
    labels = jnp.where(bg, 0, labels)
    labels = jnp.where(force | pos, gt_classes[a2g_idx].astype(jnp.int32), labels)
    labels = jnp.where(any_gt, labels, 0)

    fg = labels > 0
    matched_gt = gt_boxes[a2g_idx]
    # 7-dof anchors; velocity-extended anchor codes (vx=vy=0 anchors) can be
    # realized by padding `anchors` with zero columns at the call site
    ncols = min(gt_boxes.shape[1], anchors.shape[1])
    reg = coder.encode(matched_gt[:, :ncols], anchors[:, :ncols])
    reg = jnp.where(fg[:, None], reg, 0.0)
    return labels, reg


def assign_anchor_targets(anchors_per_class: List[jnp.ndarray], gt_boxes, class_ids,
                          coder: ResidualCoder, matched_thr: Sequence[float],
                          unmatched_thr: Sequence[float]):
    """Batched multi-class assignment. gt_boxes: (B, M, D) with global
    1-based class in the last column (0 = padding). Returns dict with
    'box_cls_labels' (B, A_total), 'box_reg_targets' (B, A_total, code)."""

    def per_sample(boxes):
        cls = boxes[:, -1].astype(jnp.int32)
        valid = cls > 0
        labels_all, regs_all = [], []
        for ci, anchors in enumerate(anchors_per_class):
            flat = anchors.reshape(-1, 7)
            sel = valid & (cls == class_ids[ci])
            labels, reg = assign_targets_single(
                flat, boxes[:, :-1], cls, sel, coder,
                matched_thr[ci], unmatched_thr[ci],
            )
            labels_all.append(labels.reshape(anchors.shape[:3]))
            regs_all.append(reg.reshape(anchors.shape[:3] + (coder.code_size,)))
        # concat per-location anchors across classes (reference cat dim=-1
        # over (H, W, n_per) then flatten)
        labels = jnp.concatenate(labels_all, axis=-1).reshape(-1)
        regs = jnp.concatenate(regs_all, axis=-2).reshape(-1, coder.code_size)
        return labels, regs

    labels, regs = jax.vmap(per_sample)(gt_boxes)
    return {"box_cls_labels": labels, "box_reg_targets": regs}


# ---------------------------------------------------------------------------
# Losses (anchor_head_template.py:101-230)
# ---------------------------------------------------------------------------


def sigmoid_focal_loss(logits, one_hot_targets, weights, alpha=0.25, gamma=2.0):
    """loss_utils.SigmoidFocalClassificationLoss (elementwise, then weighted)."""
    p = jax.nn.sigmoid(logits)
    alpha_w = one_hot_targets * alpha + (1 - one_hot_targets) * (1 - alpha)
    pt = one_hot_targets * (1 - p) + (1 - one_hot_targets) * p
    focal = alpha_w * jnp.power(pt, gamma)
    bce = jnp.clip(logits, 0) - logits * one_hot_targets + jnp.log1p(jnp.exp(-jnp.abs(logits)))
    return focal * bce * weights[..., None]


def smooth_l1_loss(pred, target, weights, beta=1 / 9.0, code_weights=None):
    diff = pred - target
    if code_weights is not None:
        diff = diff * jnp.asarray(code_weights, diff.dtype)
    n = jnp.abs(diff)
    loss = jnp.where(n < beta, 0.5 * n ** 2 / beta, n - 0.5 * beta)
    return loss * weights[..., None]


def add_sin_difference(b1, b2, dim=6):
    s = jnp.sin(b1[..., dim]) * jnp.cos(b2[..., dim])
    c = jnp.cos(b1[..., dim]) * jnp.sin(b2[..., dim])
    b1 = b1.at[..., dim].set(s)
    b2 = b2.at[..., dim].set(c)
    return b1, b2


def get_direction_target(anchors_flat, reg_targets, dir_offset=0.78539, num_bins=2):
    rot_gt = reg_targets[..., 6] + anchors_flat[..., 6]
    offset_rot = jnp.mod(rot_gt - dir_offset, 2 * math.pi)
    bins = jnp.clip(jnp.floor(offset_rot / (2 * math.pi / num_bins)), 0, num_bins - 1)
    return bins.astype(jnp.int32)


def anchor_head_loss(preds, targets, anchors_flat, num_class, coder,
                     cls_weight=1.0, loc_weight=2.0, dir_weight=0.2,
                     code_weights=None, dir_offset=0.78539, num_dir_bins=2):
    """Total anchor-head loss: focal cls + smooth-L1 (sin-diff) + dir CE."""
    cls_preds = preds["cls_preds"].astype(jnp.float32)  # (B, A, num_class)
    box_preds = preds["box_preds"].astype(jnp.float32)  # (B, A, code)
    labels = targets["box_cls_labels"]  # (B, A)
    reg_t = targets["box_reg_targets"]

    cared = labels >= 0
    positives = labels > 0
    cls_w = (positives + (labels == 0)).astype(jnp.float32)
    reg_w = positives.astype(jnp.float32)
    pos_norm = jnp.clip(jnp.sum(positives, axis=1, keepdims=True).astype(jnp.float32), 1.0)
    cls_w = cls_w / pos_norm
    reg_w = reg_w / pos_norm

    cls_targets = jnp.where(cared, labels, 0)
    one_hot = jax.nn.one_hot(cls_targets, num_class + 1)[..., 1:]
    b = cls_preds.shape[0]
    cls_loss = jnp.sum(sigmoid_focal_loss(cls_preds, one_hot, cls_w)) / b * cls_weight

    anchors_b = jnp.broadcast_to(anchors_flat[None], (b,) + anchors_flat.shape)
    bp_sin, rt_sin = add_sin_difference(box_preds, reg_t)
    loc_loss = jnp.sum(smooth_l1_loss(bp_sin, rt_sin, reg_w, code_weights=code_weights)) / b * loc_weight
    total = cls_loss + loc_loss
    tb = {"rpn_loss_cls": cls_loss, "rpn_loss_loc": loc_loss}

    if "dir_cls_preds" in preds:
        dir_t = get_direction_target(anchors_b, reg_t, dir_offset, num_dir_bins)
        dir_oh = jax.nn.one_hot(dir_t, num_dir_bins)
        logp = jax.nn.log_softmax(preds["dir_cls_preds"].astype(jnp.float32), axis=-1)
        dir_loss = -jnp.sum(dir_oh * logp, axis=-1) * reg_w
        dir_loss = jnp.sum(dir_loss) / b * dir_weight
        total = total + dir_loss
        tb["rpn_loss_dir"] = dir_loss
    tb["rpn_loss"] = total
    return total, tb


def limit_period(val, offset=0.5, period=math.pi):
    """common_utils.limit_period."""
    return val - jnp.floor(val / period + offset) * period


def decode_anchor_predictions(preds, anchors_flat, coder: ResidualCoder,
                              dir_offset=0.78539, dir_limit_offset=0.0,
                              num_dir_bins=2):
    """anchor_head_template.generate_predicted_boxes (:195-230): decode box
    residuals against the anchors and snap heading to the predicted
    direction bin. Returns (batch_cls_scores sigmoid (B, A, C),
    batch_boxes (B, A, 7+))."""
    cls_scores = jax.nn.sigmoid(preds["cls_preds"])
    boxes = coder.decode(preds["box_preds"], anchors_flat[None])
    if "dir_cls_preds" in preds:
        dir_labels = jnp.argmax(preds["dir_cls_preds"], axis=-1)
        period = 2 * math.pi / num_dir_bins
        dir_rot = limit_period(boxes[..., 6] - dir_offset, dir_limit_offset, period)
        rot = dir_rot + dir_offset + period * dir_labels.astype(boxes.dtype)
        boxes = boxes.at[..., 6].set(rot)
    return cls_scores, boxes


# ---------------------------------------------------------------------------
# The head module
# ---------------------------------------------------------------------------


class AnchorHeadSingle(nn.Module):
    """1x1-conv anchor head (anchor_head_single.py:7-58)."""

    num_class: int
    num_anchors_per_location: int
    code_size: int
    num_dir_bins: int = 2
    use_dir: bool = True
    dtype: Any = None

    @nn.compact
    def __call__(self, spatial_features_2d, train: bool) -> Dict[str, jnp.ndarray]:
        b, h, w, _ = spatial_features_2d.shape
        n = self.num_anchors_per_location

        def bias_focal(key, shape, dtype=jnp.float32):
            return jnp.full(shape, -math.log((1 - 0.01) / 0.01), dtype)

        cls = nn.Conv(n * self.num_class, (1, 1), bias_init=bias_focal,
                      dtype=self.dtype, name="conv_cls")(spatial_features_2d)
        box = nn.Conv(
            n * self.code_size, (1, 1),
            kernel_init=lambda k, s, d=jnp.float32: jax.random.normal(k, s, d) * 1e-3,
            dtype=self.dtype, name="conv_box",
        )(spatial_features_2d)
        out = {
            "cls_preds": cls.reshape(b, h * w * n, self.num_class),
            "box_preds": box.reshape(b, h * w * n, self.code_size),
        }
        if self.use_dir:
            d = nn.Conv(n * self.num_dir_bins, (1, 1), dtype=self.dtype,
                        name="conv_dir_cls")(spatial_features_2d)
            out["dir_cls_preds"] = d.reshape(b, h * w * n, self.num_dir_bins)
        return out
