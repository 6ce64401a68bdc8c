import numpy as np
import jax.numpy as jnp

from radardistill_tpu.ops import nms
from tests import reference_impls as ref
from tests.test_geometry import random_boxes


def test_nms_matches_greedy_reference():
    rng = np.random.RandomState(0)
    boxes = random_boxes(60, seed=12, spread=6.0)
    scores = rng.uniform(0, 1, 60).astype(np.float32)
    valid = np.ones(60, bool)

    sel, sel_valid = nms.class_agnostic_nms(
        jnp.asarray(boxes), jnp.asarray(scores), jnp.asarray(valid),
        nms_thresh=0.2, pre_max=60, post_max=30,
    )
    got = list(np.asarray(sel)[np.asarray(sel_valid)])

    want = ref.nms_rotated(boxes, scores, 0.2)[:30]
    assert got == want


def test_nms_respects_validity_and_score_thresh():
    boxes = random_boxes(20, seed=13)
    scores = np.linspace(1, 0.05, 20).astype(np.float32)
    valid = np.ones(20, bool)
    valid[0] = False  # best box is padding

    sel, sel_valid = nms.class_agnostic_nms(
        jnp.asarray(boxes), jnp.asarray(scores), jnp.asarray(valid),
        nms_thresh=0.2, pre_max=20, post_max=20, score_thresh=0.5,
    )
    kept = np.asarray(sel)[np.asarray(sel_valid)]
    assert 0 not in kept
    assert all(scores[k] > 0.5 for k in kept)


def test_nms_pre_max_truncation():
    boxes = random_boxes(50, seed=14, spread=100.0)  # far apart: no suppression
    scores = np.linspace(1, 0.1, 50).astype(np.float32)
    sel, sel_valid = nms.class_agnostic_nms(
        jnp.asarray(boxes), jnp.asarray(scores), jnp.ones(50, bool),
        nms_thresh=0.2, pre_max=10, post_max=50,
    )
    kept = np.asarray(sel)[np.asarray(sel_valid)]
    assert list(kept) == list(range(10))
