"""Vectorized target assignment vs a numpy transcription of the reference's
per-box CPU loop (center_head.py:111-235)."""

import numpy as np
import jax.numpy as jnp

from radardistill_tpu.models.center_head import HeadSpec, assign_targets
from tests import reference_impls as ref

CLASS_NAMES = ["car", "truck", "bus", "pedestrian"]
HEADS = [["car"], ["truck", "bus"], ["pedestrian"]]
PC_RANGE = [-20.0, -20.0, -5.0, 20.0, 20.0, 3.0]
VOXEL = [0.25, 0.25, 8.0]
STRIDE = 2
HW = (80, 80)  # H, W  (grid 160/stride 2)


def reference_assign(gt_boxes_one, head_classes, num_max_objs=20):
    """numpy re-implementation of assign_target_of_single_head for one head,
    operating on compacted boxes like the reference."""
    H, W = HW
    sel = [b for b in gt_boxes_one if b[-1] > 0 and CLASS_NAMES[int(b[-1]) - 1] in head_classes]
    hm = np.zeros((len(head_classes), H, W), np.float32)
    inds, mask, rets = [], [], []
    for b in sel[:num_max_objs]:
        x, y, z = b[0], b[1], b[2]
        cx = np.clip((x - PC_RANGE[0]) / VOXEL[0] / STRIDE, 0, W - 0.5)
        cy = np.clip((y - PC_RANGE[1]) / VOXEL[1] / STRIDE, 0, H - 0.5)
        dxf = b[3] / VOXEL[0] / STRIDE
        dyf = b[4] / VOXEL[1] / STRIDE
        if dxf <= 0 or dyf <= 0:
            continue
        r = max(int(ref.gaussian_radius_np(dxf, dyf, 0.1)), 2)
        cls_local = head_classes.index(CLASS_NAMES[int(b[-1]) - 1])
        ref.draw_gaussian(hm[cls_local], (cx, cy), r)
        ix, iy = int(cx), int(cy)
        inds.append(iy * W + ix)
        mask.append(1)
        ret = np.zeros(10, np.float32)
        ret[0:2] = [cx - ix, cy - iy]
        ret[2] = z
        ret[3:6] = np.log(b[3:6])
        ret[6], ret[7] = np.cos(b[6]), np.sin(b[6])
        ret[8:10] = b[7:9]
        rets.append(ret)
    return hm, inds, mask, rets


def make_boxes(seed=0, n=12, m_pad=20):
    rng = np.random.RandomState(seed)
    boxes = np.zeros((m_pad, 10), np.float32)
    boxes[:n, 0:2] = rng.uniform(-18, 18, (n, 2))
    boxes[:n, 2] = rng.uniform(-1, 1, n)
    boxes[:n, 3:6] = rng.uniform(1, 6, (n, 3))
    boxes[:n, 6] = rng.uniform(-np.pi, np.pi, n)
    boxes[:n, 7:9] = rng.uniform(-2, 2, (n, 2))
    boxes[:n, 9] = rng.randint(1, len(CLASS_NAMES) + 1, n)
    return boxes


def test_assign_targets_matches_reference_loop():
    spec = HeadSpec(HEADS, CLASS_NAMES)
    gt = np.stack([make_boxes(0), make_boxes(1)])
    out = assign_targets(
        jnp.asarray(gt), spec, HW, STRIDE, VOXEL, PC_RANGE,
        num_max_objs=20, gaussian_overlap=0.1, min_radius=2,
    )
    heat = np.asarray(out["heatmaps"])  # (B, n_heads, H, W, max_cls)

    for b in range(2):
        for h, head_classes in enumerate(HEADS):
            want_hm, want_inds, want_mask, want_rets = reference_assign(gt[b], head_classes)
            got_hm = heat[b, h].transpose(2, 0, 1)[: len(head_classes)]
            np.testing.assert_allclose(got_hm, want_hm, atol=1e-4)

            got_mask = np.asarray(out["masks"])[b, h].astype(bool)
            got_inds = np.asarray(out["inds"])[b, h][got_mask]
            got_rets = np.asarray(out["target_boxes"])[b, h][got_mask]
            assert sorted(got_inds.tolist()) == sorted(want_inds)
            # match rows by ind (slots aren't compacted in ours)
            for ind, retv in zip(want_inds, want_rets):
                i = list(got_inds).index(ind)
                np.testing.assert_allclose(got_rets[i], retv, atol=1e-4)


def test_padded_class_channels_empty():
    spec = HeadSpec(HEADS, CLASS_NAMES)
    gt = make_boxes(2)[None]
    out = assign_targets(
        jnp.asarray(gt), spec, HW, STRIDE, VOXEL, PC_RANGE, num_max_objs=20
    )
    # head 0 ('car' only) second channel is padding -> must be all zeros
    np.testing.assert_array_equal(np.asarray(out["heatmaps"])[0, 0, :, :, 1], 0)
