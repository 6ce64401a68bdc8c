"""End-to-end: build the full dual-branch model on a tiny grid, run one
distill train step + eval forward (the '_single pkl overfit' smoke of the
reference, SURVEY.md §4.3, done properly)."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from radardistill_tpu.data.collate import collate_batch
from radardistill_tpu.data.synthetic import make_scene
from radardistill_tpu.models import build_network
from radardistill_tpu.train.optim import build_optimizer
from radardistill_tpu.train.train_step import create_train_state, make_train_step, make_eval_step
from radardistill_tpu.utils.testing import CLASS_NAMES, make_model_cfg
from radardistill_tpu.config import ConfigDict

GRID = 96
CAPS = {"MAX_LIDAR_POINTS": 1024, "MAX_RADAR_POINTS": 256, "NUM_MAX_OBJS": 32}


def make_batch(bs=2, with_lidar=True):
    pc_range = (-3.6, -3.6, -5.0, 3.6, 3.6, 3.0)
    samples = []
    for i in range(bs):
        s = make_scene(i, num_lidar=800, num_radar=180, num_boxes=6, pc_range=pc_range)
        # shrink boxes to fit the small grid
        s["gt_boxes"][:, 3:6] = np.clip(s["gt_boxes"][:, 3:6], 0.5, 2.0)
        if not with_lidar:
            del s["points"]
        samples.append(s)
    b = collate_batch(samples, CAPS)
    b.pop("_host", None)
    return {k: jnp.asarray(v) for k, v in b.items()}


@pytest.fixture(scope="module")
def built():
    cfg, info = make_model_cfg(grid=GRID, num_max_objs=32, k_per_head=64, nms_post=16)
    model = build_network(cfg, info)
    batch = make_batch()
    optim_cfg = ConfigDict(
        OPTIMIZER="adam_onecycle", LR=1e-3, WEIGHT_DECAY=0.01, MOMS=[0.95, 0.85],
        PCT_START=0.4, DIV_FACTOR=10, GRAD_NORM_CLIP=10,
    )
    tx, _ = build_optimizer(optim_cfg, None, total_steps=100)
    state = create_train_state(model, tx, batch)
    return cfg, info, model, tx, state, batch


def test_train_step_runs_and_loss_decreases(built):
    cfg, info, model, tx, state, batch = built
    step = jax.jit(
        make_train_step(model, tx, cfg, CLASS_NAMES, info["voxel_size"], info["point_cloud_range"])
    )
    state1, m1 = step(state, batch)
    assert np.isfinite(float(m1["loss"]))
    # DCN offset-saturation telemetry (VERDICT r3 #5): sown by the CMA's
    # downsample blocks, averaged into tb — a fraction in [0, 1]
    assert "dcn_offset_sat" in m1
    assert 0.0 <= float(m1["dcn_offset_sat"]) <= 1.0
    losses = [float(m1["loss"])]
    st = state1
    for _ in range(6):
        st, m = step(st, batch)
        losses.append(float(m["loss"]))
    assert losses[-1] < losses[0], losses
    # frozen teacher params must not move
    t0 = jax.tree.leaves(state.params["backbone_3d"])[0]
    t1 = jax.tree.leaves(st.params["backbone_3d"])[0]
    np.testing.assert_array_equal(np.asarray(t0), np.asarray(t1))
    # student params must move
    r0 = jax.tree.leaves(state.params["radar_backbone_3d"])[0]
    r1 = jax.tree.leaves(st.params["radar_backbone_3d"])[0]
    assert np.abs(np.asarray(r0) - np.asarray(r1)).max() > 0


def test_eval_forward_fixed_shapes(built):
    cfg, info, model, tx, state, batch = built
    eval_step = jax.jit(make_eval_step(model))
    out = eval_step(state.params, state.batch_stats, batch)
    fb = out["final_box_dicts"]
    n_heads = 6
    assert fb["boxes"].shape == (2, n_heads * 16, 9)
    assert fb["scores"].shape == (2, n_heads * 16)
    assert fb["labels"].shape == (2, n_heads * 16)
    assert fb["valid"].shape == (2, n_heads * 16)
    labels = np.asarray(fb["labels"])[np.asarray(fb["valid"])]
    if labels.size:
        assert labels.min() >= 1 and labels.max() <= 10


def test_radar_only_eval_config():
    # mirrors radar_distill_val.yaml: teacher branch deleted
    cfg, info = make_model_cfg(
        grid=GRID, teacher=False, radar=True, distill=None,
        num_max_objs=32, k_per_head=64, nms_post=16,
    )
    model = build_network(cfg, info)
    batch = make_batch(with_lidar=False)
    variables = model.init(jax.random.PRNGKey(0), batch, False)
    out = model.apply(variables, batch, False)
    assert "final_box_dicts" in out
    assert "lidar_preds" not in out
