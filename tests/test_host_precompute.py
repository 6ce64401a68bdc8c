"""Host-precomputed VFE/AS inputs vs the device-side build (the oracle).

VERDICT r3 #2/#3: the loader builds the pillar sort/compact and the AS
rulebooks (csrc/host_ops.cpp) and ships them as batch inputs; the device
build in ops/active_site.py / models/vfe.py stays as the oracle. These
tests assert BIT-IDENTICAL tables and bit-identical model outputs.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from radardistill_tpu.data import host_ops
from radardistill_tpu.data.host_precompute import (
    HostPrecompute,
    as_tables,
    pillar_encode,
    pillar_encode_np,
)
from radardistill_tpu.models.backbone_as import PillarRes18BackBone8xAS
from radardistill_tpu.models.vfe import DynamicPillarVFESparse
from radardistill_tpu.ops import active_site as asx
from radardistill_tpu.ops import voxelize

GRID = 64
CAP = 512
VS = (108.0 / GRID, 108.0 / GRID, 8.0)
PC = (-54.0, -54.0, -5.0, 54.0, 54.0, 3.0)


def _points(b=2, n=600, seed=0, spread=60.0):
    """Random points incl. out-of-range coords and masked rows."""
    rng = np.random.RandomState(seed)
    pts = np.zeros((b, n, 5), np.float32)
    pts[..., :3] = rng.uniform(-spread, spread, (b, n, 3))
    pts[..., 3:] = rng.uniform(0, 1, (b, n, 2))
    mask = rng.rand(b, n) > 0.1
    return pts, mask


def _device_encode(pts, mask, capacity):
    """The device-side sort/compact path (the oracle pillar_encode mirrors)."""
    coords, in_range = voxelize.compute_pillar_coords(
        jnp.asarray(pts)[..., :2], PC, VS, (GRID, GRID)
    )
    valid = jnp.asarray(mask) & in_range
    ids = voxelize.pillar_ids(coords, valid, (GRID, GRID))
    order = jnp.argsort(ids, axis=-1)
    ids_s = jnp.take_along_axis(ids, order, axis=-1)
    uids, slot, count = jax.vmap(
        lambda i: asx.compact_unique_sorted(i, capacity, GRID * GRID)
    )(ids_s)
    return order, ids_s, uids, slot, count


@pytest.mark.parametrize("seed", [0, 3])
def test_pillar_encode_matches_device(seed):
    pts, mask = _points(seed=seed)
    pts_s, mask_s, pre = pillar_encode(pts, mask, PC, VS, (GRID, GRID), CAP)
    order, ids_s, uids, slot, count = _device_encode(pts, mask, CAP)

    np.testing.assert_array_equal(pre["ids"], np.asarray(ids_s))
    np.testing.assert_array_equal(pre["uids"], np.asarray(uids))
    np.testing.assert_array_equal(pre["slot"], np.asarray(slot))
    np.testing.assert_array_equal(pre["count"], np.asarray(count))
    # identical stable permutation -> identical sorted points
    np.testing.assert_array_equal(
        pts_s, np.take_along_axis(pts, np.asarray(order)[..., None], 1)
    )


@pytest.mark.parametrize("seed,cap", [(0, CAP), (5, 16)])
def test_pillar_encode_cpp_matches_numpy(seed, cap):
    """The C++ fast path (radix sort) == the numpy oracle, incl. overflow."""
    pts, mask = _points(seed=seed, n=700)
    a = pillar_encode(pts, mask, PC, VS, (GRID, GRID), cap)
    b = pillar_encode_np(pts, mask, PC, VS, (GRID, GRID), cap)
    np.testing.assert_array_equal(a[0], b[0])
    np.testing.assert_array_equal(a[1], b[1])
    for k in a[2]:
        np.testing.assert_array_equal(a[2][k], b[2][k], err_msg=k)


def test_pillar_encode_overflow_count():
    pts, mask = _points(n=900, spread=40.0)
    cap = 16  # force overflow
    _, _, pre = pillar_encode(pts, mask, PC, VS, (GRID, GRID), cap)
    _, _, uids, slot, count = _device_encode(pts, mask, cap)
    np.testing.assert_array_equal(pre["uids"], np.asarray(uids))
    np.testing.assert_array_equal(pre["slot"], np.asarray(slot))
    np.testing.assert_array_equal(pre["count"], np.asarray(count))
    assert (pre["count"] > cap).any()


def _device_tables(uids1, hw, caps, dense_from):
    """Replicates PillarRes18BackBone8xAS's per-step device table build."""
    h, w = hw
    caps = [min(int(c), (h // s) * (w // s)) for c, s in zip(caps, (1, 2, 4, 8))]
    cap1 = caps[0]
    uids = jnp.asarray(uids1)
    grid = jax.vmap(lambda u: asx.site_index_grid(u, h * w, cap1))(uids)
    nb, msk = asx.conv_neighbor_table_b(uids, grid, (h, w), w, 1, cap1)
    out = {"tap1": (nb, msk) + asx.invert_taps_b(nb, msk, cap1)}
    sh, sw, cap_in = h, w, cap1
    counts = []
    for stage in (2, 3, 4):
        if stage >= dense_from:
            break
        cap_out = caps[stage - 1]
        new_uids, cnt = jax.vmap(
            lambda u: asx.downsample_active(u, (sh, sw), cap_out)
        )(uids)
        counts.append(cnt)
        nb_d, msk_d = asx.conv_neighbor_table_b(
            new_uids, grid, (sh, sw), sw // 2, 2, cap_in
        )
        out[f"dtap{stage}"] = (nb_d, msk_d) + asx.invert_taps_b(nb_d, msk_d, cap_in)
        sh, sw, cap_in, uids = sh // 2, sw // 2, cap_out, new_uids
        out[f"uids{stage}"] = new_uids
        grid = jax.vmap(lambda u: asx.site_index_grid(u, sh * sw, cap_in))(uids)
        nb, msk = asx.conv_neighbor_table_b(uids, grid, (sh, sw), sw, 1, cap_in)
        out[f"tap{stage}"] = (nb, msk) + asx.invert_taps_b(nb, msk, cap_in)
    out["counts"] = (
        jnp.stack(counts, 1) if counts else jnp.zeros((uids.shape[0], 0), jnp.int32)
    )
    return out


@pytest.mark.parametrize("caps,dense_from", [
    ((512, 512, 512, 512), 5),       # full sparse pyramid (shipped shape)
    ((512, 256, 128, 64), 4),        # tighter caps, earlier densify
    ((512, 24, 24, 24), 3),          # forced downsample overflow
])
def test_as_tables_match_device(caps, dense_from):
    pts, mask = _points(n=900, spread=40.0)
    _, _, pre = pillar_encode(pts, mask, PC, VS, (GRID, GRID), caps[0])
    host = as_tables(pre["uids"], (GRID, GRID), caps, dense_from)
    dev = _device_tables(pre["uids"], (GRID, GRID), caps, dense_from)
    assert set(host) == set(dev)
    for k in dev:
        hv, dv = host[k], dev[k]
        if isinstance(dv, tuple):
            for i, (a, b) in enumerate(zip(hv, dv)):
                np.testing.assert_array_equal(
                    np.asarray(a), np.asarray(b), err_msg=f"{k}[{i}]"
                )
        else:
            np.testing.assert_array_equal(
                np.asarray(hv), np.asarray(dv), err_msg=k
            )


def test_vfe_pre_path_bitexact():
    pts, mask = _points()
    vfe = DynamicPillarVFESparse(
        capacity=CAP, num_filters=(32,), voxel_size=VS,
        point_cloud_range=PC, grid_size=(GRID, GRID),
    )
    variables = vfe.init(jax.random.PRNGKey(0), jnp.asarray(pts), jnp.asarray(mask), False)

    (t0, u0, c0), up0 = vfe.apply(
        variables, jnp.asarray(pts), jnp.asarray(mask), True, mutable=["batch_stats"]
    )
    pts_s, mask_s, pre = pillar_encode(pts, mask, PC, VS, (GRID, GRID), CAP)
    pre_j = jax.tree.map(jnp.asarray, pre)

    # the index half of the pre path (sort, slots, uids) is BIT-identical:
    # with the host mean stripped, the device falls back to _slot_mean and
    # everything must agree exactly
    pre_nomean = {k: v for k, v in pre_j.items() if k != "mean"}
    (t1, u1, c1), up1 = vfe.apply(
        variables, jnp.asarray(pts_s), jnp.asarray(mask_s), True, pre_nomean,
        mutable=["batch_stats"],
    )
    np.testing.assert_array_equal(np.asarray(t0), np.asarray(t1))
    np.testing.assert_array_equal(np.asarray(u0), np.asarray(u1))
    np.testing.assert_array_equal(np.asarray(c0), np.asarray(c1))
    for (pa, a), (pb, bb) in zip(
        jax.tree_util.tree_leaves_with_path(up0),
        jax.tree_util.tree_leaves_with_path(up1),
    ):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(bb), err_msg=str(pa))

    # the host cluster mean (double-accumulated C++) differs from the
    # device's f32 tree sum only at f32 rounding; the VFE output must match
    # within that noise floor
    (t2, u2, c2), up2 = vfe.apply(
        variables, jnp.asarray(pts_s), jnp.asarray(mask_s), True, pre_j,
        mutable=["batch_stats"],
    )
    np.testing.assert_array_equal(np.asarray(u0), np.asarray(u2))
    np.testing.assert_array_equal(np.asarray(c0), np.asarray(c2))
    np.testing.assert_allclose(
        np.asarray(t0), np.asarray(t2), rtol=2e-4, atol=2e-6)
    for (pa, a), (pb, bb) in zip(
        jax.tree_util.tree_leaves_with_path(up0),
        jax.tree_util.tree_leaves_with_path(up2),
    ):
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(bb), rtol=2e-4, atol=2e-6,
            err_msg=str(pa))


def test_host_mean_matches_device_slot_mean():
    """csrc per-point cluster means == device _slot_mean at f32 resolution
    (both twins: C++ and the numpy oracle), for slots below capacity (the
    device merges all overflow/sentinel points into one junk segment whose
    mean is never consumed — slot==capacity rows land in the dropped junk
    table row)."""
    from radardistill_tpu.data.host_precompute import pillar_encode_np

    pts, mask = _points()
    pts_s, mask_s, pre = pillar_encode(pts, mask, PC, VS, (GRID, GRID), CAP)
    pts_n, mask_n, pre_n = pillar_encode_np(pts, mask, PC, VS, (GRID, GRID), CAP)
    np.testing.assert_array_equal(pre["mean"], pre_n["mean"])

    vfe = DynamicPillarVFESparse(
        capacity=CAP, num_filters=(32,), voxel_size=VS,
        point_cloud_range=PC, grid_size=(GRID, GRID),
    )
    valid = jnp.asarray(pre["ids"]) < GRID * GRID
    dev_mean = vfe._slot_mean(
        jnp.asarray(pts_s[..., :3]), valid, jnp.asarray(pre["slot"]), CAP
    )
    live = np.asarray(pre["slot"]) < CAP
    np.testing.assert_allclose(
        np.asarray(dev_mean)[live], pre["mean"][live], rtol=1e-5, atol=1e-5)


@pytest.mark.parametrize("dense_from", [3, 5])
def test_backbone_tables_forward_and_grads_equal(dense_from):
    caps = (512, 512, 512, 512)
    pts, mask = _points()
    _, _, pre = pillar_encode(pts, mask, PC, VS, (GRID, GRID), caps[0])
    rng = np.random.RandomState(1)
    feats = jnp.asarray(rng.randn(2, caps[0], 32).astype(np.float32))
    feats = feats * (jnp.asarray(pre["uids"]) < GRID * GRID)[..., None]
    uids = jnp.asarray(pre["uids"])

    bk = PillarRes18BackBone8xAS(hw=(GRID, GRID), caps=caps, dense_from=dense_from)
    variables = bk.init(jax.random.PRNGKey(0), feats, uids, False)
    tables = jax.tree.map(
        jnp.asarray, as_tables(pre["uids"], (GRID, GRID), caps, dense_from)
    )

    def run(v, tab):
        out, _ = bk.apply(v, feats, uids, True, tab, mutable=["batch_stats"])
        return out

    o0, o1 = run(variables, None), run(variables, tables)
    for k in ("x_conv4", "x_conv5", "as_overflow"):
        np.testing.assert_array_equal(
            np.asarray(jax.tree.leaves(o0[k])[0]),
            np.asarray(jax.tree.leaves(o1[k])[0]), err_msg=k,
        )

    # gradients flow identically through the gather-formulated convs
    def loss(v, tab):
        out, _ = bk.apply(v, feats, uids, True, tab, mutable=["batch_stats"])
        return jnp.sum(out["x_conv5"].astype(jnp.float32) ** 2)

    g0 = jax.grad(lambda p: loss({**variables, "params": p}, None))(variables["params"])
    g1 = jax.grad(lambda p: loss({**variables, "params": p}, tables))(variables["params"])
    for (pa, a), (_, b) in zip(
        jax.tree_util.tree_leaves_with_path(g0),
        jax.tree_util.tree_leaves_with_path(g1),
    ):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b), err_msg=str(pa))


def test_mask_pyramid_matches_device():
    from radardistill_tpu.data.host_precompute import mask_pyramid
    from radardistill_tpu.models.layers import max_pool_mask

    pts, mask = _points(n=900, spread=40.0)
    _, _, pre = pillar_encode(pts, mask, PC, VS, (GRID, GRID), CAP)
    host = mask_pyramid(pre["uids"], (GRID, GRID), 3)

    uids = jnp.asarray(pre["uids"])
    m = jnp.zeros((2, GRID * GRID + 1), bool).at[
        jnp.arange(2)[:, None], jnp.minimum(uids, GRID * GRID)
    ].set(True)[:, :GRID * GRID].reshape(2, GRID, GRID)
    for k in range(3):
        m = max_pool_mask(m, 3, 2, 1)
        w_k = GRID >> (k + 1)
        # loader ships the pyramid bit-packed along W (transfer bytes);
        # np.unpackbits is the numpy twin of utils/bitpack.unpack_bool_jnp
        h_np = np.unpackbits(np.asarray(host[k]), axis=-1)[..., :w_k].astype(bool)
        np.testing.assert_array_equal(h_np, np.asarray(m), err_msg=f"level {k}")


def test_hp_as_teacher_tables():
    """AS-teacher configs get host rulebooks too (hp_as_lidar), and the
    backbone consumes them bit-identically."""
    from radardistill_tpu.utils.testing import make_model_cfg

    cfg, info = make_model_cfg(grid=64, num_max_objs=32, k_per_head=16, nms_post=8)
    cfg.BACKBONE_3D.NAME = "PillarRes18BackBone8x_AS"
    cfg.BACKBONE_3D.MAX_ACTIVE = [512, 512, 512, 512]
    cfg.BACKBONE_3D.DENSE_FROM = 3
    hp = HostPrecompute(cfg, info["grid_size"], info["voxel_size"],
                        info["point_cloud_range"])
    assert hp.lidar_cap == 512 and hp.lidar_as is not None
    pts, mask = _points()
    batch = {"points": pts, "points_mask": mask}
    out = hp(batch)
    assert "hp_lidar" in out and "hp_as_lidar" in out
    dev = _device_tables(out["hp_lidar"]["uids"], (GRID, GRID),
                         (512, 512, 512, 512), 3)
    for k in dev:
        hv, dv = out["hp_as_lidar"][k], dev[k]
        if isinstance(dv, tuple):
            for a, b in zip(hv, dv):
                np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
        else:
            np.testing.assert_array_equal(np.asarray(hv), np.asarray(dv))


def test_full_model_hp_equivalence():
    """Detector forward with host-precomputed batch == without (bit-exact)."""
    from radardistill_tpu.data.collate import collate_batch
    from radardistill_tpu.data.synthetic import make_scene
    from radardistill_tpu.models import build_network
    from radardistill_tpu.utils.testing import make_model_cfg

    cfg, info = make_model_cfg(grid=64, num_max_objs=32, k_per_head=16, nms_post=8)
    cfg.RADAR_BACKBONE_3D.NAME = "Radar_PillarRes18BackBone8x_AS"
    cfg.RADAR_BACKBONE_3D.MAX_ACTIVE = [512, 512, 512, 512]
    cfg.RADAR_BACKBONE_3D.DENSE_FROM = 5
    cfg.BACKBONE_3D.NAME = "PillarRes18BackBone8x_S2D"
    cfg.BACKBONE_3D.TABLE_INPUT = True
    cfg.BACKBONE_3D.TABLE_CAPACITY = 2048

    model = build_network(cfg, info)
    samples = [
        make_scene(i, num_lidar=800, num_radar=300, num_boxes=6,
                   pc_range=info["point_cloud_range"]) for i in range(2)
    ]
    caps = {"MAX_LIDAR_POINTS": 1024, "MAX_RADAR_POINTS": 512, "NUM_MAX_OBJS": 32}
    b0 = collate_batch(samples, caps)
    b0.pop("_host", None)

    hp = HostPrecompute(cfg, info["grid_size"], info["voxel_size"],
                        info["point_cloud_range"])
    b1 = hp(dict(b0))
    assert "hp_lidar" in b1 and "hp_radar" in b1 and "hp_as" in b1
    assert "hp_masks" in b1  # TABLE_INPUT S2D teacher: host mask pyramid

    batch0 = jax.tree.map(jnp.asarray, b0)
    batch1 = jax.tree.map(jnp.asarray, b1)
    variables = model.init(jax.random.PRNGKey(0), batch0, True)

    out0, _ = model.apply(variables, batch0, True, mutable=["batch_stats"])
    out1, _ = model.apply(variables, batch1, True, mutable=["batch_stats"])

    # with the host cluster mean stripped, the hp path is BIT-exact (the
    # index half — sort/slots/uids/rulebooks — is the same integers)
    b1_nm = dict(b1)
    for hk in ("hp_lidar", "hp_radar"):
        b1_nm[hk] = {k: v for k, v in b1_nm[hk].items() if k != "mean"}
    out1_nm, _ = model.apply(
        jax.tree.map(jnp.asarray, variables), jax.tree.map(jnp.asarray, b1_nm),
        True, mutable=["batch_stats"])
    for k in ("radar_spatial_features_2d", "x_conv4", "spatial_features_2d",
              "as_overflow"):
        np.testing.assert_array_equal(
            np.asarray(out0[k]), np.asarray(out1_nm[k]), err_msg=k
        )

    # with the host mean (double-accumulated vs the device's f32 tree sum):
    # equal within the f32 noise floor propagated through the model
    np.testing.assert_array_equal(
        np.asarray(out0["as_overflow"]), np.asarray(out1["as_overflow"]))
    for k in ("radar_spatial_features_2d", "x_conv4", "spatial_features_2d"):
        a, b = np.asarray(out0[k], np.float32), np.asarray(out1[k], np.float32)
        rel = np.linalg.norm(a - b) / (np.linalg.norm(a) + 1e-9)
        assert rel < 2e-3, (k, rel)


def test_bitpack_roundtrip_device():
    """pack_bool_np (host) -> unpack_bool_jnp (device) is the identity,
    including non-multiple-of-8 widths."""
    from radardistill_tpu.utils.bitpack import pack_bool_np, unpack_bool_jnp

    rng = np.random.RandomState(7)
    for w in (8, 13, 64, 90):
        m = rng.rand(2, 5, w) > 0.6
        p = pack_bool_np(m)
        assert p.dtype == np.uint8 and p.shape == (2, 5, (w + 7) // 8)
        back = np.asarray(unpack_bool_jnp(jnp.asarray(p), w))
        np.testing.assert_array_equal(back, m)


def test_hp_drops_ids_when_no_overflow():
    """HostPrecompute omits per-point ids when capacity >= n_points; the
    VFE reconstructs them exactly (covered bit-exactly by
    test_full_model_hp_equivalence, asserted structurally here)."""
    from radardistill_tpu.utils.testing import make_model_cfg

    cfg, info = make_model_cfg(grid=64, num_max_objs=32, k_per_head=16, nms_post=8)
    cfg.BACKBONE_3D.NAME = "PillarRes18BackBone8x_AS"
    cfg.BACKBONE_3D.MAX_ACTIVE = [2048, 512, 512, 512]
    cfg.BACKBONE_3D.DENSE_FROM = 3
    hp = HostPrecompute(cfg, info["grid_size"], info["voxel_size"],
                        info["point_cloud_range"])
    pts, mask = _points(n=600)  # 600 <= 2048: no overflow possible
    out = hp({"points": pts, "points_mask": mask})
    assert "ids" not in out["hp_lidar"]
    assert "slot" in out["hp_lidar"] and "uids" in out["hp_lidar"]
