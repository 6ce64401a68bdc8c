"""C++ host ops vs the JAX device ops — the two rotated-IoU implementations
must agree (both already tested against the numpy reference independently)."""

import numpy as np
import jax.numpy as jnp

from radardistill_tpu.data import host_ops
from radardistill_tpu.ops import geometry
from tests.test_geometry import random_boxes


def test_cpp_matches_jax_iou_bev():
    a = random_boxes(20, seed=20, spread=5.0)
    b = random_boxes(15, seed=21, spread=5.0)
    cpp = host_ops.boxes_iou_bev(a, b)
    dev = np.asarray(geometry.boxes_iou_bev(jnp.asarray(a), jnp.asarray(b)))
    np.testing.assert_allclose(cpp, dev, atol=2e-4)


def test_cpp_matches_jax_iou_3d():
    a = random_boxes(12, seed=22, spread=4.0)
    b = random_boxes(12, seed=23, spread=4.0)
    cpp = host_ops.boxes_iou_3d(a, b)
    dev = np.asarray(geometry.boxes_iou3d(jnp.asarray(a), jnp.asarray(b)))
    np.testing.assert_allclose(cpp, dev, atol=2e-4)


def test_cpp_points_in_boxes_matches_jax():
    rng = np.random.RandomState(0)
    pts = rng.uniform(-6, 6, (300, 3)).astype(np.float32)
    boxes = random_boxes(5, seed=24, spread=3.0)
    cpp = host_ops.points_in_boxes(pts, boxes)  # first containing box or -1
    dev = np.asarray(geometry.points_in_boxes(jnp.asarray(pts), jnp.asarray(boxes)))
    for i in range(300):
        inside = np.nonzero(dev[i])[0]
        if cpp[i] == -1:
            assert len(inside) == 0
        else:
            assert cpp[i] in inside
