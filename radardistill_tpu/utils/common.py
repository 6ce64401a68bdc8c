"""Common utilities: logging, seeding, meters.

Reference: pcdet/utils/common_utils.py (rank-aware logger :110-124, seeding
:127-137, AverageMeter :287-302).
"""

from __future__ import annotations

import logging
import random

import numpy as np


def create_logger(log_file=None, rank=0, log_level=logging.INFO):
    logger = logging.getLogger(f"radardistill_tpu.rank{rank}")
    logger.setLevel(log_level if rank == 0 else logging.ERROR)
    logger.propagate = False
    formatter = logging.Formatter("%(asctime)s  %(levelname)5s  %(message)s")
    if not logger.handlers:
        console = logging.StreamHandler()
        console.setLevel(log_level if rank == 0 else logging.ERROR)
        console.setFormatter(formatter)
        logger.addHandler(console)
        if log_file is not None:
            fh = logging.FileHandler(log_file)
            fh.setLevel(log_level if rank == 0 else logging.ERROR)
            fh.setFormatter(formatter)
            logger.addHandler(fh)
    return logger


def set_random_seed(seed):
    random.seed(seed)
    np.random.seed(seed)


class AverageMeter:
    def __init__(self):
        self.reset()

    def reset(self):
        self.val = self.avg = self.sum = 0.0
        self.count = 0

    def update(self, val, n=1):
        self.val = val
        self.sum += val * n
        self.count += n
        self.avg = self.sum / max(self.count, 1)


def maybe_init_distributed():
    """Wire multi-process jax from the launcher env (tools/scripts/
    multihost_*.sh export JAX_COORDINATOR_ADDRESS / JAX_PROCESS_COUNT /
    JAX_PROCESS_INDEX — the torch.distributed.launch equivalent of the
    reference dist_train.sh). No-op for single-process runs. Must be called
    before any jax backend init."""
    import os

    n = int(os.environ.get("JAX_PROCESS_COUNT", "1"))
    if n <= 1:
        return False
    import jax

    jax.distributed.initialize(
        coordinator_address=os.environ["JAX_COORDINATOR_ADDRESS"],
        num_processes=n,
        process_id=int(os.environ["JAX_PROCESS_INDEX"]),
    )
    return True
