"""Synthetic scene generator — test/bench stand-in for nuScenes.

Serves the role of the reference's `_single` smoke pkls
(nuscenes_dataset_distill.py:515-533): deterministic tiny scenes to overfit
and to drive shape/perf tests without the 300GB dataset.
"""

from __future__ import annotations

import numpy as np


def make_scene(
    seed: int,
    num_lidar: int = 2000,
    num_radar: int = 200,
    num_boxes: int = 10,
    num_classes: int = 10,
    pc_range=(-54.0, -54.0, -5.0, 54.0, 54.0, 3.0),
    lidar_feats: int = 5,
    radar_feats: int = 6,
):
    """Returns dict(points (N,5) xyzit, radar_points (M,6) xyz+rcs+vxy,
    gt_boxes (K, 10) [x,y,z,dx,dy,dz,heading,vx,vy,cls])."""
    rng = np.random.RandomState(seed)
    lo = np.array(pc_range[:3])
    hi = np.array(pc_range[3:])

    boxes = np.zeros((num_boxes, 10), np.float32)
    boxes[:, 0:2] = rng.uniform(lo[0] * 0.8, hi[0] * 0.8, (num_boxes, 2))
    boxes[:, 2] = rng.uniform(-2, 0.5, num_boxes)
    boxes[:, 3:5] = rng.uniform(0.5, 6.0, (num_boxes, 2))
    boxes[:, 5] = rng.uniform(0.8, 3.0, num_boxes)
    boxes[:, 6] = rng.uniform(-np.pi, np.pi, num_boxes)
    boxes[:, 7:9] = rng.uniform(-3, 3, (num_boxes, 2))
    boxes[:, 9] = rng.randint(1, num_classes + 1, num_boxes)

    def cloud(n, nf):
        pts = np.zeros((n, nf), np.float32)
        # half background, half on objects (so detection is learnable)
        nb = n // 2
        pts[:nb, 0:3] = rng.uniform(lo, hi, (nb, 3))
        per_box = max((n - nb) // max(num_boxes, 1), 1)
        i = nb
        for b in boxes:
            k = min(per_box, n - i)
            if k <= 0:
                break
            local = rng.uniform(-0.5, 0.5, (k, 3)) * b[3:6]
            c, s = np.cos(b[6]), np.sin(b[6])
            pts[i : i + k, 0] = local[:, 0] * c - local[:, 1] * s + b[0]
            pts[i : i + k, 1] = local[:, 0] * s + local[:, 1] * c + b[1]
            pts[i : i + k, 2] = local[:, 2] + b[2]
            i += k
        pts[:, 3:] = rng.uniform(0, 1, (n, nf - 3))
        return pts

    return {
        "points": cloud(num_lidar, lidar_feats),
        "radar_points": cloud(num_radar, radar_feats),
        "gt_boxes": boxes,
        "frame_id": f"synthetic_{seed}",
    }
