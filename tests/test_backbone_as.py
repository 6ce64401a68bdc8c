"""Active-site backbone/VFE equivalence vs the masked-dense formulation.

Round 1 proved masked-dense == reference spconv semantics; this file proves
active-site == masked-dense on shared parameters (the param trees are
identical by construction), which transitively pins the AS path to the
reference numerics contract.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from radardistill_tpu.data.collate import collate_batch
from radardistill_tpu.data.synthetic import make_scene
from radardistill_tpu.models.backbone_as import PillarRes18BackBone8xAS
from radardistill_tpu.models.backbone_sparse2d import PillarRes18BackBone8x
from radardistill_tpu.models.vfe import DynamicPillarVFESimple2D, DynamicPillarVFESparse
from radardistill_tpu.ops import active_site as asx

GRID = 64
CAP = 512
VS = (108.0 / GRID, 108.0 / GRID, 8.0)
PC = (-54.0, -54.0, -5.0, 54.0, 54.0, 3.0)


def _points(b=2, n=600, seed=0):
    rng = np.random.RandomState(seed)
    pts = np.zeros((b, n, 5), np.float32)
    pts[..., :3] = rng.uniform(-50, 50, (b, n, 3))
    pts[..., 3:] = rng.uniform(0, 1, (b, n, 2))
    mask = rng.rand(b, n) > 0.1
    return jnp.asarray(pts), jnp.asarray(mask)


def _vfe_kwargs():
    return dict(
        num_filters=(32,), voxel_size=VS, point_cloud_range=PC, grid_size=(GRID, GRID)
    )


@pytest.mark.parametrize("train", [False, True])
def test_sparse_vfe_matches_dense(train):
    pts, mask = _points()
    dense = DynamicPillarVFESimple2D(**_vfe_kwargs())
    sparse = DynamicPillarVFESparse(capacity=CAP, **_vfe_kwargs())
    variables = dense.init(jax.random.PRNGKey(0), pts, mask, False)

    bev, pmask = dense.apply(variables, pts, mask, train, mutable=["batch_stats"])[0]
    (table, uids, count), updates = sparse.apply(
        variables, pts, mask, train, mutable=["batch_stats"]
    )
    got_bev, got_mask = jax.vmap(lambda f, u: asx.densify(f, u, (GRID, GRID)))(table, uids)

    assert int(count.max()) < CAP  # no overflow in this fixture
    np.testing.assert_array_equal(np.asarray(got_mask), np.asarray(pmask))
    np.testing.assert_allclose(np.asarray(got_bev), np.asarray(bev), rtol=1e-5, atol=1e-5)

    if train:  # running stats must agree too (same active rows)
        _, dense_updates = dense.apply(variables, pts, mask, True, mutable=["batch_stats"])
        for a, b in zip(
            jax.tree.leaves(dense_updates["batch_stats"]),
            jax.tree.leaves(updates["batch_stats"]),
        ):
            np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=1e-5, atol=1e-6)


@pytest.mark.parametrize("dense_from", [2, 3, 4, 5])
def test_as_backbone_matches_masked_dense(dense_from):
    rng = np.random.RandomState(1)
    b, h = 2, GRID
    n_active = 150
    bev = np.zeros((b, h, h, 32), np.float32)
    mask = np.zeros((b, h, h), bool)
    for i in range(b):
        ids = rng.choice(h * h, n_active, replace=False)
        mask[i].reshape(-1)[ids] = True
        bev[i].reshape(-1, 32)[ids] = rng.randn(n_active, 32)
    bev, mask = jnp.asarray(bev), jnp.asarray(mask)

    ref = PillarRes18BackBone8x()
    variables = ref.init(jax.random.PRNGKey(0), bev, mask, False)
    want = ref.apply(variables, bev, mask, False)

    caps = (1024, 1024, 1024, 1024)
    feats, uids, _ = jax.vmap(lambda x, m: asx.sparsify(x, m, caps[0]))(bev, mask)
    got = PillarRes18BackBone8xAS(
        hw=(h, h), caps=caps, dense_from=dense_from, densify_all=True
    ).apply(variables, feats, uids, False)

    for k in ["x_conv1", "x_conv2", "x_conv3", "x_conv4", "x_conv5"]:
        np.testing.assert_allclose(
            np.asarray(got[k]), np.asarray(want[k]), rtol=2e-4, atol=2e-4,
            err_msg=k,
        )
    for k in ["mask1", "mask2", "mask3", "mask4"]:
        np.testing.assert_array_equal(
            np.asarray(got[k]).astype(bool), np.asarray(want[k]).astype(bool), err_msg=k
        )


def test_as_backbone_train_stats_match():
    """BN batch_stats updates agree between formulations in train mode."""
    rng = np.random.RandomState(3)
    b, h = 2, 32
    bev = np.zeros((b, h, h, 32), np.float32)
    mask = rng.rand(b, h, h) < 0.05
    bev[mask] = rng.randn(int(mask.sum()), 32)
    bev, mask = jnp.asarray(bev), jnp.asarray(mask)

    ref = PillarRes18BackBone8x()
    variables = ref.init(jax.random.PRNGKey(0), bev, mask, False)
    _, want_upd = ref.apply(variables, bev, mask, True, mutable=["batch_stats"])

    caps = (256, 256, 256, 256)
    feats, uids, _ = jax.vmap(lambda x, m: asx.sparsify(x, m, caps[0]))(bev, mask)
    _, got_upd = PillarRes18BackBone8xAS(hw=(h, h), caps=caps, dense_from=3).apply(
        variables, feats, uids, True, mutable=["batch_stats"]
    )
    import flax.traverse_util as tu

    w = tu.flatten_dict(want_upd["batch_stats"])
    g = tu.flatten_dict(got_upd["batch_stats"])
    assert set(w) == set(g)
    for k in w:
        np.testing.assert_allclose(
            np.asarray(g[k]), np.asarray(w[k]), rtol=1e-4, atol=1e-5, err_msg="/".join(k)
        )


def test_e2e_detector_as_matches_standard():
    """Full distill detector: AS config applies the STANDARD config's
    variables unchanged and reproduces its outputs."""
    from radardistill_tpu.models import build_network
    from radardistill_tpu.utils.testing import make_model_cfg

    caps = {"MAX_LIDAR_POINTS": 512, "MAX_RADAR_POINTS": 128,
            "NUM_MAX_OBJS": 16, "BATCH": 2}
    cfg, info = make_model_cfg(grid=96, teacher=True, radar=True, distill=True,
                               num_max_objs=16, k_per_head=32, nms_post=8)
    samples = [
        make_scene(i, num_lidar=400, num_radar=100, num_boxes=8,
                   pc_range=info["point_cloud_range"])
        for i in range(2)
    ]
    b = collate_batch(samples, caps)
    b.pop("_host", None)
    batch = {k: jnp.asarray(v) for k, v in b.items()}

    std = build_network(cfg, info)
    variables = std.init(jax.random.PRNGKey(0), batch, True)
    want = std.apply(variables, batch, True, mutable=["batch_stats"])[0]

    import copy
    cfg2 = copy.deepcopy(cfg)
    cfg2.BACKBONE_3D.NAME = "PillarRes18BackBone8x_AS"
    cfg2.BACKBONE_3D.MAX_ACTIVE = [1024, 1024, 1024, 1024]
    cfg2.RADAR_BACKBONE_3D.NAME = "Radar_PillarRes18BackBone8x_AS"
    cfg2.RADAR_BACKBONE_3D.MAX_ACTIVE = [512, 512, 512, 512]
    asd = build_network(cfg2, info)
    got = asd.apply(variables, batch, True, mutable=["batch_stats"])[0]

    for k in ["x_conv4", "x_conv5", "radar_x_conv4", "spatial_features_2d",
              "radar_spatial_features_2d"]:
        np.testing.assert_allclose(
            np.asarray(got[k]), np.asarray(want[k]), rtol=5e-4, atol=5e-4, err_msg=k
        )


def test_as_overflow_counter():
    """Undersized stage caps must be reported via out['as_overflow']
    (sites dropped silently otherwise — the counter is the monitoring
    contract for choosing MAX_ACTIVE)."""
    rng = np.random.RandomState(3)
    b, h = 1, GRID
    n_active = 200
    bev = np.zeros((b, h, h, 32), np.float32)
    mask = np.zeros((b, h, h), bool)
    ids = rng.choice(h * h, n_active, replace=False)
    mask[0].reshape(-1)[ids] = True
    bev[0].reshape(-1, 32)[ids] = rng.randn(n_active, 32)

    feats, uids, _ = jax.vmap(lambda x, m: asx.sparsify(x, m, 256))(
        jnp.asarray(bev), jnp.asarray(mask)
    )
    # stage-2 cap of 32 is far below the ~200+ dilated active sites
    bb = PillarRes18BackBone8xAS(hw=(h, h), caps=(256, 32, 32, 32), dense_from=3)
    variables = bb.init(jax.random.PRNGKey(0), feats, uids, False)
    out = bb.apply(variables, feats, uids, False, mutable=["batch_stats"])[0]
    assert int(out["as_overflow"]) > 0

    bb_ok = PillarRes18BackBone8xAS(hw=(h, h), caps=(256, 4096, 4096, 4096), dense_from=3)
    variables = bb_ok.init(jax.random.PRNGKey(0), feats, uids, False)
    out = bb_ok.apply(variables, feats, uids, False, mutable=["batch_stats"])[0]
    assert int(out["as_overflow"]) == 0
