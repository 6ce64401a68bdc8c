"""Checkpoint roundtrip + teacher→radar surgery + rotation."""

import numpy as np
import jax
import jax.numpy as jnp

from radardistill_tpu.train.checkpoint import (
    CheckpointManager,
    duplicate_teacher_to_radar,
)
from radardistill_tpu.train.train_step import TrainState


def make_state(seed=0):
    rng = np.random.RandomState(seed)
    params = {
        "backbone_3d": {"conv1_0": {"conv": {"kernel": jnp.asarray(rng.randn(3, 3, 4, 4), jnp.float32)}}},
        "radar_backbone_3d": {"conv1_0": {"conv": {"kernel": jnp.zeros((3, 3, 4, 4))}}},
        "vfe": {"pfn_0": {"linear": {"kernel": jnp.asarray(rng.randn(14, 32), jnp.float32)}}},
        "radar_vfe": {"pfn_0": {"linear": {"kernel": jnp.zeros((15, 32))}}},  # radar in-dim differs
    }
    return TrainState(
        step=jnp.asarray(7, jnp.int32), params=params,
        batch_stats={}, opt_state={"count": jnp.asarray(3)},
    )


def test_surgery_copies_matching_shapes_only():
    state = make_state()
    out = duplicate_teacher_to_radar(state.params)
    np.testing.assert_array_equal(
        np.asarray(out["radar_backbone_3d"]["conv1_0"]["conv"]["kernel"]),
        np.asarray(state.params["backbone_3d"]["conv1_0"]["conv"]["kernel"]),
    )
    # shape-mismatched radar VFE linear keeps its own init
    np.testing.assert_array_equal(
        np.asarray(out["radar_vfe"]["pfn_0"]["linear"]["kernel"]), 0.0
    )


def test_save_restore_roundtrip(tmp_path):
    mgr = CheckpointManager(tmp_path, max_ckpt_save_num=2)
    s1 = make_state(1)
    mgr.save(s1, epoch=1)
    mgr.save(make_state(2), epoch=2)
    mgr.save(make_state(3), epoch=3)
    # rotation: only 2 newest kept
    assert mgr.list_epochs() == [2, 3]

    template = make_state(0)
    restored = mgr.restore(template)
    assert restored is not None
    state, epoch, it = restored
    assert epoch == 3
    np.testing.assert_array_equal(
        np.asarray(state.params["backbone_3d"]["conv1_0"]["conv"]["kernel"]),
        np.asarray(make_state(3).params["backbone_3d"]["conv1_0"]["conv"]["kernel"]),
    )


def test_restore_specific_epoch(tmp_path):
    mgr = CheckpointManager(tmp_path)
    mgr.save(make_state(1), epoch=1)
    mgr.save(make_state(2), epoch=2)
    state, epoch, _ = mgr.restore(make_state(0), epoch=1)
    assert epoch == 1


def test_restore_prefers_newer_latest(tmp_path):
    """The time-interval 'latest' save resumes with priority when newest —
    mid-epoch resume (reference latest_model, train_utils.py:143-151)."""
    import time as _time

    mgr = CheckpointManager(tmp_path, max_ckpt_save_num=5)
    mgr.save(jax.device_get(make_state(3)), epoch=2, it=20)
    _time.sleep(0.05)
    mgr.save(jax.device_get(make_state(7)), epoch=2, it=27, tag="latest")

    restored = mgr.restore(make_state(0))
    assert restored is not None
    st, epoch, it = restored
    assert (epoch, it) == (2, 27)
    want = np.asarray(jax.tree.leaves(make_state(7).params)[0])
    np.testing.assert_array_equal(np.asarray(jax.tree.leaves(st.params)[0]), want)

    # when a numeric ckpt is newer than latest, it wins
    _time.sleep(0.05)
    mgr.save(jax.device_get(make_state(9)), epoch=3, it=30)
    st, epoch, it = mgr.restore(make_state(0))
    assert (epoch, it) == (3, 30)
