"""Pure-JAX 3D/BEV box geometry.

TPU-native replacement for the reference's CUDA geometry stack
(reference: pcdet/ops/iou3d_nms/src/iou3d_nms_kernel.cu — polygon-clipping
rotated overlap; pcdet/models/model_utils/centernet_utils.py:9-35 gaussian
radius, :455-530 DIoU/GIoU; pcdet/utils/box_utils.py corners / points-in-box).

Everything here is vectorized over fixed-shape arrays and differentiable where
it needs to be (DIoU/GIoU are used as losses). Boxes follow the pcdet layout
``[x, y, z, dx, dy, dz, heading]`` with heading around +z.

The rotated intersection uses Sutherland–Hodgman clipping of one box by the
other's 4 half-planes on a fixed 8-vertex ring buffer — branch-free, so XLA
can tile it on the VPU — instead of the reference's per-pair CUDA thread with
data-dependent vertex lists.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

# ---------------------------------------------------------------------------
# Corners / basic transforms
# ---------------------------------------------------------------------------


def boxes_to_corners_bev(boxes: jnp.ndarray) -> jnp.ndarray:
    """(..., 7) boxes -> (..., 4, 2) BEV corner loop (counter-clockwise).

    Corner order matches pcdet box_utils.boxes_to_corners_3d's bottom face:
    starting at (+dx/2, -dy/2) rotated by heading, CCW when heading=0.
    """
    x, y = boxes[..., 0], boxes[..., 1]
    dx, dy = boxes[..., 3], boxes[..., 4]
    cos_a, sin_a = jnp.cos(boxes[..., 6]), jnp.sin(boxes[..., 6])
    # local corner template (4, 2)
    tmpl = jnp.array(
        [[0.5, -0.5], [0.5, 0.5], [-0.5, 0.5], [-0.5, -0.5]], dtype=boxes.dtype
    )
    lx = tmpl[:, 0] * dx[..., None]  # (..., 4)
    ly = tmpl[:, 1] * dy[..., None]
    cx = lx * cos_a[..., None] - ly * sin_a[..., None] + x[..., None]
    cy = lx * sin_a[..., None] + ly * cos_a[..., None] + y[..., None]
    return jnp.stack([cx, cy], axis=-1)


def boxes_to_corners_3d(boxes: jnp.ndarray) -> jnp.ndarray:
    """(..., 7) -> (..., 8, 3) 3D corners (bottom 4 then top 4)."""
    bev = boxes_to_corners_bev(boxes)  # (..., 4, 2)
    z, dz = boxes[..., 2], boxes[..., 5]
    z_lo = (z - dz / 2)[..., None]
    z_hi = (z + dz / 2)[..., None]
    bot = jnp.concatenate([bev, jnp.broadcast_to(z_lo[..., None], bev[..., :1].shape)], -1)
    top = jnp.concatenate([bev, jnp.broadcast_to(z_hi[..., None], bev[..., :1].shape)], -1)
    return jnp.concatenate([bot, top], axis=-2)


def points_in_boxes(points_xyz: jnp.ndarray, boxes: jnp.ndarray) -> jnp.ndarray:
    """(N, 3) points x (M, 7) boxes -> (N, M) bool membership.

    Rotate-translate into the box frame then axis-aligned test — the TPU
    equivalent of the reference's roiaware CUDA `points_in_boxes_gpu`
    (pcdet/ops/roiaware_pool3d/src/roiaware_pool3d_kernel.cu check_pt_in_box3d).
    """
    shift = points_xyz[:, None, :] - boxes[None, :, :3]  # (N, M, 3)
    cos_a = jnp.cos(-boxes[:, 6])
    sin_a = jnp.sin(-boxes[:, 6])
    local_x = shift[..., 0] * cos_a - shift[..., 1] * sin_a
    local_y = shift[..., 0] * sin_a + shift[..., 1] * cos_a
    in_x = jnp.abs(local_x) < boxes[None, :, 3] / 2
    in_y = jnp.abs(local_y) < boxes[None, :, 4] / 2
    in_z = jnp.abs(shift[..., 2]) < boxes[None, :, 5] / 2
    return in_x & in_y & in_z


# ---------------------------------------------------------------------------
# Rotated BEV overlap (Sutherland–Hodgman on fixed ring buffers)
# ---------------------------------------------------------------------------

_MAX_VERTS = 8  # 4-gon clipped by 4 half-planes has <= 8 vertices


def _polygon_area(verts: jnp.ndarray, n_valid: jnp.ndarray) -> jnp.ndarray:
    """Shoelace area of the first ``n_valid`` vertices of an 8-slot ring.

    verts: (..., 8, 2); n_valid: (...,) int. Invalid slots are ignored by
    masking edge contributions; the ring wraps from vertex n_valid-1 to 0.
    """
    idx = jnp.arange(_MAX_VERTS)
    nxt = (idx + 1) % _MAX_VERTS
    # wrap last valid vertex to vertex 0 instead of slot nxt
    valid = idx < n_valid[..., None]  # (..., 8) with broadcasting
    is_last = idx == (n_valid[..., None] - 1)
    x, y = verts[..., 0], verts[..., 1]
    x_n = jnp.where(is_last, x[..., 0:1], jnp.take(x, nxt, axis=-1))
    y_n = jnp.where(is_last, y[..., 0:1], jnp.take(y, nxt, axis=-1))
    cross = x * y_n - x_n * y
    return 0.5 * jnp.abs(jnp.sum(jnp.where(valid, cross, 0.0), axis=-1))


def _pair_intersection_area(corners_a: jnp.ndarray, corners_b: jnp.ndarray):
    """Intersection area of two convex quads given as (4,2) CCW corners."""
    return _intersection_area_batched(corners_a[None], corners_b[None])[0]


def _clip_halfplane_batched(verts, n_valid, p0, p1):
    """Sutherland–Hodgman step over arbitrary leading batch dims.

    verts: (..., 8, 2); n_valid: (...,) int32; p0/p1: (..., 2).
    All ops elementwise/broadcast over the batch dims — no per-pair control
    flow, so XLA sees one fused batched program (the nested-vmap variant
    compiled pathologically slowly at NMS sizes).
    """
    ex = (p1 - p0)[..., None, :]  # (..., 1, 2)
    d = ex[..., 0] * (verts[..., 1] - p0[..., None, 1]) - ex[..., 1] * (
        verts[..., 0] - p0[..., None, 0]
    )  # (..., 8)
    idx = jnp.arange(_MAX_VERTS)
    is_last = idx == (n_valid[..., None] - 1)
    nxt_d = jnp.where(is_last, d[..., 0:1], jnp.roll(d, -1, axis=-1))
    nxt_v = jnp.where(
        is_last[..., None], verts[..., 0:1, :], jnp.roll(verts, -1, axis=-2)
    )
    valid = idx < n_valid[..., None]

    inside = d >= 0
    nxt_inside = nxt_d >= 0
    denom = d - nxt_d
    t = d / jnp.where(jnp.abs(denom) < 1e-12, 1e-12, denom)
    inter = verts + t[..., None] * (nxt_v - verts)

    emit_v = inside & valid
    emit_i = (inside != nxt_inside) & valid
    out_pts = jnp.stack([verts, inter], axis=-2).reshape(*verts.shape[:-2], 16, 2)
    out_keep = jnp.stack([emit_v, emit_i], axis=-1).reshape(*d.shape[:-1], 16)
    # sort-free stable compaction: destination slot = exclusive prefix count.
    # Masked sum over the 16 candidate slots — fuses into one reduction (the
    # previous one_hot+einsum formulation lowered to a real dot over a
    # materialized (..., 16, 8) f32 one-hot: ~20 ms/step of NMS decode time
    # at 500 candidates, r2 inference profile).
    pos = jnp.cumsum(out_keep, axis=-1) - 1
    o_idx = jnp.arange(_MAX_VERTS)
    sel = out_keep[..., :, None] & (pos[..., :, None] == o_idx)  # (..., 16, 8)
    out = jnp.sum(
        jnp.where(sel[..., None], out_pts[..., :, None, :], 0.0), axis=-3
    )
    n_out = jnp.minimum(jnp.sum(out_keep, axis=-1).astype(jnp.int32), _MAX_VERTS)
    return out, n_out


def _intersection_area_batched(corners_a, corners_b):
    """(..., 4, 2) x (..., 4, 2) CCW quads -> (...,) intersection areas."""
    batch = corners_a.shape[:-2]
    verts = jnp.concatenate(
        [corners_a, jnp.zeros(batch + (4, 2), corners_a.dtype)], axis=-2
    )
    n = jnp.full(batch, 4, jnp.int32)
    for e in range(4):
        p0 = corners_b[..., e, :]
        p1 = corners_b[..., (e + 1) % 4, :]
        verts, n = _clip_halfplane_batched(verts, n, p0, p1)
    return jnp.where(n >= 3, _polygon_area(verts, n), 0.0)


def boxes_overlap_bev(boxes_a: jnp.ndarray, boxes_b: jnp.ndarray) -> jnp.ndarray:
    """(N, 7) x (M, 7) -> (N, M) rotated BEV intersection areas.

    Equivalent of iou3d_nms_cuda.boxes_overlap_bev_gpu.
    """
    ca = boxes_to_corners_bev(boxes_a)  # (N, 4, 2)
    cb = boxes_to_corners_bev(boxes_b)  # (M, 4, 2)
    n, m = ca.shape[0], cb.shape[0]
    ca_pairs = jnp.broadcast_to(ca[:, None], (n, m, 4, 2))
    cb_pairs = jnp.broadcast_to(cb[None, :], (n, m, 4, 2))
    return _intersection_area_batched(ca_pairs, cb_pairs)


def boxes_overlap_bev_aligned(boxes_a, boxes_b):
    """(N, 7) x (N, 7) -> (N,) pairwise rotated BEV intersection areas."""
    ca = boxes_to_corners_bev(boxes_a)
    cb = boxes_to_corners_bev(boxes_b)
    return _intersection_area_batched(ca, cb)


def boxes_iou_bev(boxes_a, boxes_b):
    """Rotated BEV IoU matrix (iou3d_nms_utils.boxes_iou_bev equivalent)."""
    inter = boxes_overlap_bev(boxes_a, boxes_b)
    area_a = (boxes_a[:, 3] * boxes_a[:, 4])[:, None]
    area_b = (boxes_b[:, 3] * boxes_b[:, 4])[None, :]
    return inter / jnp.clip(area_a + area_b - inter, 1e-6)


def _height_overlap(boxes_a, boxes_b):
    a_max = (boxes_a[:, 2] + boxes_a[:, 5] / 2)[:, None]
    a_min = (boxes_a[:, 2] - boxes_a[:, 5] / 2)[:, None]
    b_max = (boxes_b[:, 2] + boxes_b[:, 5] / 2)[None, :]
    b_min = (boxes_b[:, 2] - boxes_b[:, 5] / 2)[None, :]
    return jnp.clip(jnp.minimum(a_max, b_max) - jnp.maximum(a_min, b_min), 0)


def boxes_iou3d(boxes_a, boxes_b):
    """3D IoU matrix (iou3d_nms_utils.boxes_iou3d_gpu, iou3d_nms_utils.py:48-80)."""
    overlaps_bev = boxes_overlap_bev(boxes_a, boxes_b)
    overlaps_3d = overlaps_bev * _height_overlap(boxes_a, boxes_b)
    vol_a = (boxes_a[:, 3] * boxes_a[:, 4] * boxes_a[:, 5])[:, None]
    vol_b = (boxes_b[:, 3] * boxes_b[:, 4] * boxes_b[:, 5])[None, :]
    return overlaps_3d / jnp.clip(vol_a + vol_b - overlaps_3d, 1e-6)


def boxes_aligned_iou3d(boxes_a, boxes_b):
    """(N,7) x (N,7) -> (N,) elementwise 3D IoU
    (iou3d_nms_utils.boxes_aligned_iou3d_gpu, iou3d_nms_utils.py:85-120)."""
    inter_bev = boxes_overlap_bev_aligned(boxes_a, boxes_b)
    a_max = boxes_a[:, 2] + boxes_a[:, 5] / 2
    a_min = boxes_a[:, 2] - boxes_a[:, 5] / 2
    b_max = boxes_b[:, 2] + boxes_b[:, 5] / 2
    b_min = boxes_b[:, 2] - boxes_b[:, 5] / 2
    hov = jnp.clip(jnp.minimum(a_max, b_max) - jnp.maximum(a_min, b_min), 0)
    overlaps_3d = inter_bev * hov
    vol_a = boxes_a[:, 3] * boxes_a[:, 4] * boxes_a[:, 5]
    vol_b = boxes_b[:, 3] * boxes_b[:, 4] * boxes_b[:, 5]
    return overlaps_3d / jnp.clip(vol_a + vol_b - overlaps_3d, 1e-6)


# ---------------------------------------------------------------------------
# Axis-aligned DIoU / GIoU (CenterPoint-style; used as losses — differentiable)
# ---------------------------------------------------------------------------


def center_to_corner2d(center, dim):
    """centernet_utils.center_to_corner2d (centernet_utils.py:455-460)."""
    corners_norm = jnp.array(
        [[-0.5, -0.5], [-0.5, 0.5], [0.5, 0.5], [0.5, -0.5]], dtype=dim.dtype
    )
    return dim[:, None, :] * corners_norm[None] + center[:, None, :]


def bbox3d_overlaps_diou(pred_boxes, gt_boxes):
    """Axis-aligned-in-BEV DIoU (centernet_utils.py:462-497). (N,7)x(N,7)->(N,)."""
    qc = center_to_corner2d(pred_boxes[:, :2], pred_boxes[:, 3:5])
    gc = center_to_corner2d(gt_boxes[:, :2], gt_boxes[:, 3:5])
    inter_max = jnp.minimum(qc[:, 2], gc[:, 2])
    inter_min = jnp.maximum(qc[:, 0], gc[:, 0])
    out_max = jnp.maximum(qc[:, 2], gc[:, 2])
    out_min = jnp.minimum(qc[:, 0], gc[:, 0])

    vol_p = pred_boxes[:, 3] * pred_boxes[:, 4] * pred_boxes[:, 5]
    vol_g = gt_boxes[:, 3] * gt_boxes[:, 4] * gt_boxes[:, 5]
    inter_h = jnp.clip(
        jnp.minimum(pred_boxes[:, 2] + 0.5 * pred_boxes[:, 5], gt_boxes[:, 2] + 0.5 * gt_boxes[:, 5])
        - jnp.maximum(pred_boxes[:, 2] - 0.5 * pred_boxes[:, 5], gt_boxes[:, 2] - 0.5 * gt_boxes[:, 5]),
        0,
    )
    inter = jnp.clip(inter_max - inter_min, 0)
    vol_inter = inter[:, 0] * inter[:, 1] * inter_h
    vol_union = vol_g + vol_p - vol_inter

    inter_diag = jnp.sum((gt_boxes[:, 0:3] - pred_boxes[:, 0:3]) ** 2, axis=-1)
    outer_h = jnp.clip(
        jnp.maximum(gt_boxes[:, 2] + 0.5 * gt_boxes[:, 5], pred_boxes[:, 2] + 0.5 * pred_boxes[:, 5])
        - jnp.minimum(gt_boxes[:, 2] - 0.5 * gt_boxes[:, 5], pred_boxes[:, 2] - 0.5 * pred_boxes[:, 5]),
        0,
    )
    outer = jnp.clip(out_max - out_min, 0)
    outer_diag = outer[:, 0] ** 2 + outer[:, 1] ** 2 + outer_h ** 2
    dious = vol_inter / jnp.clip(vol_union, 1e-6) - inter_diag / jnp.clip(outer_diag, 1e-6)
    return jnp.clip(dious, -1.0, 1.0)


def bbox3d_overlaps_giou(pred_boxes, gt_boxes):
    """Axis-aligned-in-BEV GIoU (centernet_utils.py:499-530)."""
    qc = center_to_corner2d(pred_boxes[:, :2], pred_boxes[:, 3:5])
    gc = center_to_corner2d(gt_boxes[:, :2], gt_boxes[:, 3:5])
    inter_max = jnp.minimum(qc[:, 2], gc[:, 2])
    inter_min = jnp.maximum(qc[:, 0], gc[:, 0])
    out_max = jnp.maximum(qc[:, 2], gc[:, 2])
    out_min = jnp.minimum(qc[:, 0], gc[:, 0])

    vol_p = pred_boxes[:, 3] * pred_boxes[:, 4] * pred_boxes[:, 5]
    vol_g = gt_boxes[:, 3] * gt_boxes[:, 4] * gt_boxes[:, 5]
    inter_h = jnp.clip(
        jnp.minimum(gt_boxes[:, 2] + 0.5 * gt_boxes[:, 5], pred_boxes[:, 2] + 0.5 * pred_boxes[:, 5])
        - jnp.maximum(gt_boxes[:, 2] - 0.5 * gt_boxes[:, 5], pred_boxes[:, 2] - 0.5 * pred_boxes[:, 5]),
        0,
    )
    inter = jnp.clip(inter_max - inter_min, 0)
    vol_inter = inter[:, 0] * inter[:, 1] * inter_h
    vol_union = vol_g + vol_p - vol_inter
    outer_h = inter_h * 0 + jnp.clip(
        jnp.maximum(gt_boxes[:, 2] + 0.5 * gt_boxes[:, 5], pred_boxes[:, 2] + 0.5 * pred_boxes[:, 5])
        - jnp.minimum(gt_boxes[:, 2] - 0.5 * gt_boxes[:, 5], pred_boxes[:, 2] - 0.5 * pred_boxes[:, 5]),
        0,
    )
    outer = jnp.clip(out_max - out_min, 0)
    closure = outer[:, 0] * outer[:, 1] * outer_h
    gious = vol_inter / jnp.clip(vol_union, 1e-6) - (closure - vol_union) / jnp.clip(closure, 1e-6)
    return jnp.clip(gious, -1.0, 1.0)


# ---------------------------------------------------------------------------
# Gaussian radius (target assignment)
# ---------------------------------------------------------------------------


def gaussian_radius(height, width, min_overlap=0.5):
    """CenterNet gaussian radius (centernet_utils.py:9-35). Elementwise."""
    a1 = 1.0
    b1 = height + width
    c1 = width * height * (1 - min_overlap) / (1 + min_overlap)
    sq1 = jnp.sqrt(jnp.clip(b1 ** 2 - 4 * a1 * c1, 0))
    r1 = (b1 + sq1) / 2

    a2 = 4.0
    b2 = 2 * (height + width)
    c2 = (1 - min_overlap) * width * height
    sq2 = jnp.sqrt(jnp.clip(b2 ** 2 - 4 * a2 * c2, 0))
    r2 = (b2 + sq2) / 2

    a3 = 4 * min_overlap
    b3 = -2 * min_overlap * (height + width)
    c3 = (min_overlap - 1) * width * height
    sq3 = jnp.sqrt(jnp.clip(b3 ** 2 - 4 * a3 * c3, 0))
    r3 = (b3 + sq3) / 2
    return jnp.minimum(jnp.minimum(r1, r2), r3)
