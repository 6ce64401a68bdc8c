"""Data-parallel correctness: the sharded 8-device train step must produce
the same loss/params as the single-device run on the same global batch —
the property DDP gets by construction and the reference never tests
(SURVEY.md §4.5: no fake multi-device backend there)."""

import numpy as np
import jax
from jax.sharding import NamedSharding, PartitionSpec as P

from radardistill_tpu.config import ConfigDict
from radardistill_tpu.models import build_network
from radardistill_tpu.parallel.mesh import make_mesh
from radardistill_tpu.train.optim import build_optimizer
from radardistill_tpu.train.train_step import create_train_state, make_train_step
from radardistill_tpu.utils.testing import CLASS_NAMES, make_model_cfg
from tests.test_e2e import make_batch, GRID


def test_dp_matches_single_device():
    cfg, info = make_model_cfg(grid=GRID, num_max_objs=32, k_per_head=64, nms_post=16)
    model = build_network(cfg, info)
    batch = make_batch(bs=8)
    optim_cfg = ConfigDict(
        OPTIMIZER="adam_onecycle", LR=1e-3, WEIGHT_DECAY=0.01, MOMS=[0.95, 0.85],
        PCT_START=0.4, DIV_FACTOR=10, GRAD_NORM_CLIP=10,
    )
    tx, _ = build_optimizer(optim_cfg, None, total_steps=10)
    state = create_train_state(model, tx, batch)
    step = make_train_step(model, tx, cfg, CLASS_NAMES, info["voxel_size"], info["point_cloud_range"])

    # single device
    s1, m1 = jax.jit(step)(state, batch)
    loss_single = float(m1["loss"])

    # 8-device dp
    mesh = make_mesh(jax.devices()[:8])
    repl = NamedSharding(mesh, P())
    dp = NamedSharding(mesh, P("dp"))
    state_dp = jax.device_put(state, repl)
    batch_dp = jax.tree.map(lambda x: jax.device_put(x, dp), batch)
    s8, m8 = jax.jit(step, in_shardings=(repl, dp), out_shardings=(repl, repl))(state_dp, batch_dp)
    loss_dp = float(m8["loss"])

    # f32 reduction order differs between the sharded (psum-tree) and
    # single-device executions; the semantics are identical
    np.testing.assert_allclose(loss_dp, loss_single, rtol=2e-3)
    p1 = jax.tree.leaves(s1.params["radar_backbone_3d"])[0]
    p8 = jax.tree.leaves(s8.params["radar_backbone_3d"])[0]
    np.testing.assert_allclose(np.asarray(p8), np.asarray(p1), rtol=5e-3, atol=5e-4)


def test_per_replica_bn_differs_from_sync():
    """SYNC_BN=False (shard_map DDP step): BN normalizes with local-shard
    statistics — reference DDP default (no SyncBN conversion). The updated
    running stats must DIFFER from the global-batch (sync) step on a
    heterogeneous batch, while still training (params replicated + finite)."""
    cfg, info = make_model_cfg(grid=GRID, num_max_objs=32, k_per_head=64, nms_post=16)
    model = build_network(cfg, info)
    batch = make_batch(bs=8)
    # make per-shard point distributions strongly heterogeneous so local
    # BN statistics differ across replicas
    pts = np.array(batch["points"])  # writable copy
    for i in range(8):
        pts[i, :, 3:] *= (i + 1) / 4.0
    batch["points"] = pts

    optim_cfg = ConfigDict(
        OPTIMIZER="adam_onecycle", LR=1e-3, WEIGHT_DECAY=0.01, MOMS=[0.95, 0.85],
        PCT_START=0.4, DIV_FACTOR=10, GRAD_NORM_CLIP=10,
    )
    tx, _ = build_optimizer(optim_cfg, None, total_steps=10)
    state = create_train_state(model, tx, batch)

    mesh = make_mesh(jax.devices()[:8])
    repl = NamedSharding(mesh, P())
    dp = NamedSharding(mesh, P("dp"))
    state_dp = jax.device_put(state, repl)
    batch_dp = jax.tree.map(lambda x: jax.device_put(x, dp), batch)

    step_sync = make_train_step(
        model, tx, cfg, CLASS_NAMES, info["voxel_size"], info["point_cloud_range"],
        mesh=mesh, sync_bn=True,
    )
    step_local = make_train_step(
        model, tx, cfg, CLASS_NAMES, info["voxel_size"], info["point_cloud_range"],
        mesh=mesh, sync_bn=False,
    )
    s_sync, m_sync = jax.jit(step_sync, in_shardings=(repl, dp),
                             out_shardings=(repl, repl))(state_dp, batch_dp)
    s_loc, m_loc = jax.jit(step_local)(state_dp, batch_dp)

    assert np.isfinite(float(m_loc["loss"]))
    # local-BN normalization changes the forward -> loss differs from sync
    assert abs(float(m_loc["loss"]) - float(m_sync["loss"])) > 1e-6
    # running stats: global-batch vs mean-of-local-batch variance differ
    var_sync = np.asarray(
        jax.tree.leaves(s_sync.batch_stats["radar_backbone_3d"])[0])
    var_loc = np.asarray(
        jax.tree.leaves(s_loc.batch_stats["radar_backbone_3d"])[0])
    assert var_sync.shape == var_loc.shape
    assert np.max(np.abs(var_sync - var_loc)) > 0
    # params stay replicated and finite under the shard_map step
    leaf = s_loc.params["radar_backbone_3d"]
    assert all(np.all(np.isfinite(np.asarray(x))) for x in jax.tree.leaves(leaf))
