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
