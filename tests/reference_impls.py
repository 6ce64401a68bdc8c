"""Independent numpy reference implementations used only by tests.

These mirror the *math* of the reference implementation (dynamic lists,
per-pair loops — exactly what we cannot run on TPU) so that the static-shape
JAX ops can be checked against a structurally different implementation.
"""

import numpy as np


# ---- rotated polygon intersection (dynamic Sutherland–Hodgman) -------------

def box_corners_bev(box):
    x, y, _, dx, dy, _, a = box[:7]
    c, s = np.cos(a), np.sin(a)
    pts = []
    for lx, ly in [(0.5, -0.5), (0.5, 0.5), (-0.5, 0.5), (-0.5, -0.5)]:
        px, py = lx * dx, ly * dy
        pts.append((px * c - py * s + x, px * s + py * c + y))
    return np.array(pts)


def clip_polygon(poly, p0, p1):
    """Clip polygon (list of 2d pts) by half-plane left of edge p0->p1."""
    out = []
    n = len(poly)
    ex, ey = p1[0] - p0[0], p1[1] - p0[1]

    def side(pt):
        return ex * (pt[1] - p0[1]) - ey * (pt[0] - p0[0])

    for i in range(n):
        cur, nxt = poly[i], poly[(i + 1) % n]
        dc, dn = side(cur), side(nxt)
        if dc >= 0:
            out.append(cur)
        if (dc >= 0) != (dn >= 0):
            t = dc / (dc - dn)
            out.append((cur[0] + t * (nxt[0] - cur[0]), cur[1] + t * (nxt[1] - cur[1])))
    return out


def polygon_area(poly):
    if len(poly) < 3:
        return 0.0
    a = 0.0
    for i in range(len(poly)):
        x0, y0 = poly[i]
        x1, y1 = poly[(i + 1) % len(poly)]
        a += x0 * y1 - x1 * y0
    return abs(a) / 2


def rotated_overlap_bev(box_a, box_b):
    pa = [tuple(p) for p in box_corners_bev(box_a)]
    pb = box_corners_bev(box_b)
    poly = pa
    for i in range(4):
        poly = clip_polygon(poly, pb[i], pb[(i + 1) % 4])
        if not poly:
            return 0.0
    return polygon_area(poly)


def iou_bev(box_a, box_b):
    inter = rotated_overlap_bev(box_a, box_b)
    ua = box_a[3] * box_a[4] + box_b[3] * box_b[4] - inter
    return inter / max(ua, 1e-6)


def iou_3d(box_a, box_b):
    inter_bev = rotated_overlap_bev(box_a, box_b)
    amax, amin = box_a[2] + box_a[5] / 2, box_a[2] - box_a[5] / 2
    bmax, bmin = box_b[2] + box_b[5] / 2, box_b[2] - box_b[5] / 2
    h = max(0.0, min(amax, bmax) - max(amin, bmin))
    inter = inter_bev * h
    va = box_a[3] * box_a[4] * box_a[5]
    vb = box_b[3] * box_b[4] * box_b[5]
    return inter / max(va + vb - inter, 1e-6)


def nms_rotated(boxes, scores, thresh):
    """Greedy rotated-BEV-IoU NMS, dynamic keep list (the CUDA algorithm)."""
    order = np.argsort(-scores, kind="stable")
    keep = []
    suppressed = np.zeros(len(boxes), bool)
    for i in order:
        if suppressed[i]:
            continue
        keep.append(i)
        for j in order:
            if j == i or suppressed[j]:
                continue
            if iou_bev(boxes[i], boxes[j]) > thresh:
                if scores[j] < scores[i] or (scores[j] == scores[i] and list(order).index(j) > list(order).index(i)):
                    suppressed[j] = True
    return keep


# ---- dynamic pillar reduction (torch.unique + scatter semantics) -----------

def dynamic_pillar_reduce(points, pc_range, voxel_size, grid_size, mode="max"):
    """points: (N, C) with xy in cols 0:2. Returns dense (ny, nx, C) grid."""
    nx, ny = grid_size
    coords = np.floor((points[:, :2] - np.array(pc_range[:2])) / np.array(voxel_size[:2])).astype(int)
    ok = (coords[:, 0] >= 0) & (coords[:, 0] < nx) & (coords[:, 1] >= 0) & (coords[:, 1] < ny)
    bev = np.zeros((ny, nx, points.shape[1]))
    cnt = np.zeros((ny, nx))
    for p, (cx, cy), good in zip(points, coords, ok):
        if not good:
            continue
        if mode == "max":
            bev[cy, cx] = p if cnt[cy, cx] == 0 else np.maximum(bev[cy, cx], p)
        else:
            bev[cy, cx] += p
        cnt[cy, cx] += 1
    return bev, cnt


# ---- per-box gaussian heatmap draw (the reference CPU loop) ----------------

def gaussian_radius_np(h, w, min_overlap):
    a1 = 1
    b1 = h + w
    c1 = w * h * (1 - min_overlap) / (1 + min_overlap)
    sq1 = np.sqrt(b1 ** 2 - 4 * a1 * c1)
    r1 = (b1 + sq1) / 2
    a2 = 4
    b2 = 2 * (h + w)
    c2 = (1 - min_overlap) * w * h
    sq2 = np.sqrt(b2 ** 2 - 4 * a2 * c2)
    r2 = (b2 + sq2) / 2
    a3 = 4 * min_overlap
    b3 = -2 * min_overlap * (h + w)
    c3 = (min_overlap - 1) * w * h
    sq3 = np.sqrt(b3 ** 2 - 4 * a3 * c3)
    r3 = (b3 + sq3) / 2
    return min(r1, r2, r3)


def draw_gaussian(heatmap, center, radius):
    """centernet_utils.draw_gaussian_to_heatmap (centernet_utils.py:47-69)."""
    diameter = 2 * radius + 1
    sigma = diameter / 6
    m = (diameter - 1) / 2
    y, x = np.ogrid[-m : m + 1, -m : m + 1]
    g = np.exp(-(x * x + y * y) / (2 * sigma * sigma))

    cx, cy = int(center[0]), int(center[1])
    height, width = heatmap.shape
    left, right = min(cx, radius), min(width - cx, radius + 1)
    top, bottom = min(cy, radius), min(height - cy, radius + 1)
    masked = heatmap[cy - top : cy + bottom, cx - left : cx + right]
    mg = g[radius - top : radius + bottom, radius - left : radius + right]
    np.maximum(masked, mg, out=masked)
    return heatmap
