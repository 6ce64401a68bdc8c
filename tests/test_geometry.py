import numpy as np
import jax.numpy as jnp
from radardistill_tpu.ops import geometry
from tests import reference_impls as ref


def random_boxes(n, seed=0, spread=10.0):
    rng = np.random.RandomState(seed)
    boxes = np.zeros((n, 7), np.float32)
    boxes[:, 0:2] = rng.uniform(-spread, spread, (n, 2))
    boxes[:, 2] = rng.uniform(-2, 2, n)
    boxes[:, 3:6] = rng.uniform(0.5, 5.0, (n, 3))
    boxes[:, 6] = rng.uniform(-np.pi, np.pi, n)
    return boxes


def test_corners_bev_axis_aligned():
    box = jnp.array([[1.0, 2.0, 0.0, 4.0, 2.0, 1.0, 0.0]])
    c = np.asarray(geometry.boxes_to_corners_bev(box))[0]
    expect = np.array([[3, 1], [3, 3], [-1, 3], [-1, 1]], float)
    np.testing.assert_allclose(c, expect, atol=1e-6)


def test_overlap_bev_vs_reference():
    boxes_a = random_boxes(24, seed=1)
    boxes_b = random_boxes(18, seed=2)
    got = np.asarray(geometry.boxes_overlap_bev(jnp.asarray(boxes_a), jnp.asarray(boxes_b)))
    for i in range(boxes_a.shape[0]):
        for j in range(boxes_b.shape[0]):
            want = ref.rotated_overlap_bev(boxes_a[i], boxes_b[j])
            assert abs(got[i, j] - want) < 1e-3, (i, j, got[i, j], want)


def test_overlap_identical_box():
    boxes = random_boxes(8, seed=3)
    got = np.asarray(geometry.boxes_overlap_bev(jnp.asarray(boxes), jnp.asarray(boxes)))
    areas = boxes[:, 3] * boxes[:, 4]
    np.testing.assert_allclose(np.diag(got), areas, rtol=1e-4)


def test_iou3d_vs_reference():
    boxes_a = random_boxes(10, seed=4, spread=4.0)
    boxes_b = random_boxes(10, seed=5, spread=4.0)
    got = np.asarray(geometry.boxes_iou3d(jnp.asarray(boxes_a), jnp.asarray(boxes_b)))
    for i in range(10):
        for j in range(10):
            want = ref.iou_3d(boxes_a[i], boxes_b[j])
            assert abs(got[i, j] - want) < 1e-3


def test_aligned_iou3d_matches_matrix_diag():
    boxes_a = random_boxes(12, seed=6, spread=3.0)
    boxes_b = random_boxes(12, seed=7, spread=3.0)
    mat = np.asarray(geometry.boxes_iou3d(jnp.asarray(boxes_a), jnp.asarray(boxes_b)))
    aligned = np.asarray(geometry.boxes_aligned_iou3d(jnp.asarray(boxes_a), jnp.asarray(boxes_b)))
    np.testing.assert_allclose(aligned, np.diag(mat), atol=1e-5)


def test_gaussian_radius_matches_reference():
    rng = np.random.RandomState(0)
    h = rng.uniform(1, 30, 50).astype(np.float32)
    w = rng.uniform(1, 30, 50).astype(np.float32)
    got = np.asarray(geometry.gaussian_radius(jnp.asarray(h), jnp.asarray(w), 0.1))
    want = np.array([ref.gaussian_radius_np(hh, ww, 0.1) for hh, ww in zip(h, w)])
    np.testing.assert_allclose(got, want, rtol=1e-4)


def test_points_in_boxes():
    boxes = np.array([[0, 0, 0, 4, 2, 2, np.pi / 2]], np.float32)
    pts = np.array(
        [[0, 0, 0], [0, 1.9, 0], [1.9, 0, 0], [0, 0, 1.1], [0.9, 0, 0]], np.float32
    )
    got = np.asarray(geometry.points_in_boxes(jnp.asarray(pts), jnp.asarray(boxes)))[:, 0]
    # box rotated 90deg: extent ±2 along y, ±1 along x, ±1 in z
    np.testing.assert_array_equal(got, [True, True, False, False, True])


def test_diou_giou_bounds_and_identity():
    boxes = random_boxes(16, seed=8)
    d = np.asarray(geometry.bbox3d_overlaps_diou(jnp.asarray(boxes), jnp.asarray(boxes)))
    g = np.asarray(geometry.bbox3d_overlaps_giou(jnp.asarray(boxes), jnp.asarray(boxes)))
    np.testing.assert_allclose(d, 1.0, atol=1e-5)
    np.testing.assert_allclose(g, 1.0, atol=1e-5)
    other = random_boxes(16, seed=9)
    d2 = np.asarray(geometry.bbox3d_overlaps_diou(jnp.asarray(boxes), jnp.asarray(other)))
    assert np.all(d2 <= 1.0) and np.all(d2 >= -1.0)


def test_diou_matches_torch_formula():
    # independent numpy transcription of centernet_utils.bbox3d_overlaps_diou
    a = random_boxes(32, seed=10, spread=3.0).astype(np.float64)
    b = random_boxes(32, seed=11, spread=3.0).astype(np.float64)

    def diou_np(p, g):
        inter_w = np.maximum(
            0, np.minimum(p[0] + p[3] / 2, g[0] + g[3] / 2) - np.maximum(p[0] - p[3] / 2, g[0] - g[3] / 2)
        )
        inter_l = np.maximum(
            0, np.minimum(p[1] + p[4] / 2, g[1] + g[4] / 2) - np.maximum(p[1] - p[4] / 2, g[1] - g[4] / 2)
        )
        inter_h = np.maximum(
            0, np.minimum(p[2] + p[5] / 2, g[2] + g[5] / 2) - np.maximum(p[2] - p[5] / 2, g[2] - g[5] / 2)
        )
        vi = inter_w * inter_l * inter_h
        vu = p[3] * p[4] * p[5] + g[3] * g[4] * g[5] - vi
        inter_diag = np.sum((p[:3] - g[:3]) ** 2)
        ow = np.maximum(p[0] + p[3] / 2, g[0] + g[3] / 2) - np.minimum(p[0] - p[3] / 2, g[0] - g[3] / 2)
        ol = np.maximum(p[1] + p[4] / 2, g[1] + g[4] / 2) - np.minimum(p[1] - p[4] / 2, g[1] - g[4] / 2)
        oh = np.maximum(p[2] + p[5] / 2, g[2] + g[5] / 2) - np.minimum(p[2] - p[5] / 2, g[2] - g[5] / 2)
        outer_diag = ow ** 2 + ol ** 2 + oh ** 2
        return np.clip(vi / vu - inter_diag / outer_diag, -1, 1)

    got = np.asarray(
        geometry.bbox3d_overlaps_diou(jnp.asarray(a, jnp.float32), jnp.asarray(b, jnp.float32))
    )
    want = np.array([diou_np(a[i], b[i]) for i in range(32)])
    np.testing.assert_allclose(got, want, atol=1e-4)
