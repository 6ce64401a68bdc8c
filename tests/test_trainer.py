"""Trainer orchestration: epoch loop, disable-aug hook, checkpoint cadence —
exercised with a stub train step (no JAX compile)."""

import numpy as np
import jax.numpy as jnp

from radardistill_tpu.config import ConfigDict
from radardistill_tpu.train.train_step import TrainState
from radardistill_tpu.train.trainer import train_model


class FakeLoader:
    class _Aug:
        def __init__(self):
            self.disabled = None

        def disable_augmentation(self, cfgs):
            self.disabled = cfgs["DISABLE_AUG_LIST"]

    class _DS:
        def __init__(self):
            self.data_augmentor = FakeLoader._Aug()

    def __init__(self, n_batches=3):
        self.n = n_batches
        self.dataset = self._DS()
        self.epochs_seen = []

    def set_epoch(self, e):
        self.epochs_seen.append(e)

    def __len__(self):
        return self.n

    def __iter__(self):
        for _ in range(self.n):
            yield {"x": np.zeros(2)}, None


def test_train_model_hook_and_ckpts(tmp_path):
    state = TrainState(step=jnp.asarray(0), params={"w": jnp.zeros(3)},
                       batch_stats={}, opt_state={})
    calls = []

    def step(state, batch):
        calls.append(1)
        return state.replace(step=state.step + 1), {"loss": jnp.asarray(1.0)}

    cfg = ConfigDict(
        DATA_CONFIG=ConfigDict(DATA_AUGMENTOR=ConfigDict(
            DISABLE_AUG_LIST=["placeholder"],
            AUG_CONFIG_LIST=[{"NAME": "random_world_flip_distill", "ALONG_AXIS_LIST": ["x"]}],
        )),
        HOOK=ConfigDict(DisableAugmentationHook=ConfigDict(
            DISABLE_AUG_LIST=["random_world_flip_distill"], NUM_LAST_EPOCHS=1,
        )),
    )
    loader = FakeLoader()
    out_state = train_model(
        step, state, loader, lr_sched=None, cfg=cfg, total_epochs=2,
        ckpt_dir=tmp_path, ckpt_save_interval=1, max_ckpt_save_num=5,
    )
    assert len(calls) == 6  # 2 epochs x 3 batches
    assert int(out_state.step) == 6
    assert loader.epochs_seen == [0, 1]
    # hook fired on the last epoch only (2 - NUM_LAST_EPOCHS = 1)
    assert loader.dataset.data_augmentor.disabled == ["random_world_flip_distill"]
    # per-epoch checkpoints exist
    assert (tmp_path / "checkpoint_epoch_1").exists()
    assert (tmp_path / "checkpoint_epoch_2").exists()


def test_eval_dedups_wrapped_samples():
    """Fixed-shape eval batches wrap the tail (loader.py:82-84); the eval
    loop must count each frame once in det_annos AND recall counters
    (reference avoids wrap via a non-padding sampler,
    pcdet/datasets/__init__.py:41-61)."""
    from radardistill_tpu.data.dataset import DatasetTemplate
    from radardistill_tpu.train.eval_utils import eval_one_epoch

    class StubDS:
        class_names = ["car"]
        generate_prediction_dicts = DatasetTemplate.generate_prediction_dicts

    def fake_batch(frame_ids):
        b = len(frame_ids)
        batch = {"gt_boxes": np.zeros((b, 2, 10), np.float32)}
        batch["gt_boxes"][:, 0, 3:6] = 2.0
        batch["gt_boxes"][:, 0, 9] = 1.0  # one valid GT per sample
        host = {"frame_id": list(frame_ids)}
        return batch, host

    def model_apply(params, batch_stats, batch):
        b = batch["gt_boxes"].shape[0]
        boxes = np.zeros((b, 4, 9), np.float32)
        boxes[:, 0, 3:6] = 2.0  # one exact match of the GT box
        valid = np.zeros((b, 4), bool)
        valid[:, 0] = True
        return {"final_box_dicts": {
            "boxes": boxes,
            "scores": np.full((b, 4), 0.9, np.float32),
            "labels": np.ones((b, 4), np.int64),
            "valid": valid,
        }}

    # 5 frames, batch 2 -> last batch wraps frame "a"
    loader = [fake_batch(["a", "b"]), fake_batch(["c", "d"]), fake_batch(["e", "a"])]
    det_annos, recall, _ = eval_one_epoch(
        model_apply, {}, {}, loader, StubDS(), thresh_list=(0.3,))
    assert [d["frame_id"] for d in det_annos] == ["a", "b", "c", "d", "e"]
    assert recall["gt"] == 5  # NOT 6: wrapped frame not double-counted
    assert recall["recall_rcnn_0.3"] == 5
