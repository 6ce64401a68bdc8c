"""Teacher-only (LiDAR PillarNet) training mode — the pillarnet.yaml path:
no radar branch, DISTILL absent, loss = teacher head loss
(pillarnet.py get_training_loss)."""

import numpy as np
import jax
import jax.numpy as jnp

from radardistill_tpu.config import ConfigDict
from radardistill_tpu.data.collate import collate_batch
from radardistill_tpu.data.synthetic import make_scene
from radardistill_tpu.models import build_network
from radardistill_tpu.train.optim import build_optimizer
from radardistill_tpu.train.train_step import create_train_state, make_train_step
from radardistill_tpu.utils.testing import CLASS_NAMES, make_model_cfg

GRID = 96


def test_teacher_only_training_mode():
    cfg, info = make_model_cfg(
        grid=GRID, teacher=True, radar=False, distill=None,
        num_max_objs=16, k_per_head=32, nms_post=8,
    )
    cfg.pop("FREEZE_PIPELINE", None)  # teacher trains here
    model = build_network(cfg, info)

    pc = info["point_cloud_range"]
    samples = []
    for i in range(2):
        s = make_scene(i, num_lidar=600, num_radar=50, num_boxes=5, pc_range=pc)
        s["gt_boxes"][:, 3:6] = np.clip(s["gt_boxes"][:, 3:6], 0.5, 2.0)
        del s["radar_points"]
        samples.append(s)
    b = collate_batch(samples, {"MAX_LIDAR_POINTS": 1024, "NUM_MAX_OBJS": 16})
    b.pop("_host", None)
    batch = {k: jnp.asarray(v) for k, v in b.items()}

    optim_cfg = ConfigDict(
        OPTIMIZER="adam_onecycle", LR=1e-3, WEIGHT_DECAY=0.01, MOMS=[0.95, 0.85],
        PCT_START=0.4, DIV_FACTOR=10, GRAD_NORM_CLIP=10,
    )
    tx, _ = build_optimizer(optim_cfg, None, total_steps=50)
    state = create_train_state(model, tx, batch)
    step = jax.jit(make_train_step(model, tx, cfg, CLASS_NAMES,
                                   info["voxel_size"], info["point_cloud_range"]))
    losses = []
    for _ in range(12):
        state, m = step(state, batch)
        losses.append(float(m["loss"]))
    assert np.all(np.isfinite(losses))
    # IoU/DIoU terms are noisy at random init: compare window means
    assert np.mean(losses[-3:]) < np.mean(losses[:3]), losses
    # teacher params must move in this mode
    p0 = model.init(jax.random.PRNGKey(0), batch, True)["params"]
    moved = jax.tree.leaves(state.params["backbone_3d"])[0]
    init = jax.tree.leaves(p0["backbone_3d"])[0]
    assert np.abs(np.asarray(moved) - np.asarray(init)).max() > 0
