"""Packed-order pillar tables (r5): the lidar S2D entry's transpose-free
densify. The table is sorted by the space-to-depth packed key
(voxelize.packed_key; id VALUES stay linear), so the entry's inverse site
map scatters directly at packed addresses and the mask is born packed.

Oracles: the linear-order packed densify (active_site.densify_packed_batch)
on the same logical table, the dense-entry backbone on shared params, and
the C++/numpy/device three-way host-precompute equality.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from radardistill_tpu.data.host_precompute import pillar_encode, pillar_encode_np
from radardistill_tpu.models.backbone_s2d import PillarRes18BackBone8xS2D
from radardistill_tpu.models.vfe import DynamicPillarVFESparse
from radardistill_tpu.ops import active_site as asx
from radardistill_tpu.ops import voxelize

GRID = 64
CAP = 512
VS = (108.0 / GRID, 108.0 / GRID, 8.0)
PC = (-54.0, -54.0, -5.0, 54.0, 54.0, 3.0)


def _points(b=2, n=600, seed=0, spread=60.0):
    rng = np.random.RandomState(seed)
    pts = np.zeros((b, n, 5), np.float32)
    pts[..., :3] = rng.uniform(-spread, spread, (b, n, 3))
    pts[..., 3:] = rng.uniform(0, 1, (b, n, 2))
    mask = rng.rand(b, n) > 0.1
    return pts, mask


def test_packed_key_bijection():
    nx = ny = GRID
    ids = jnp.arange(nx * ny + 1, dtype=jnp.int32)  # incl. sentinel
    key = voxelize.packed_key(ids, (nx, ny))
    k = np.asarray(key)
    assert k[-1] == nx * ny  # sentinel fixed point
    assert sorted(k[:-1].tolist()) == list(range(nx * ny))  # bijection
    # phase layout matches space_to_depth: id (y, x) -> parent*4 + (y%2)*2+x%2
    y, x = 7, 12
    assert k[y * nx + x] == (((y // 2) * (nx // 2) + x // 2) * 4
                             + (y % 2) * 2 + (x % 2))


def _linear_table(seed=3, b=2, cap=CAP, h=GRID):
    """A linear-sorted table + its packed reorder (stable, sentinels last)."""
    rng = np.random.RandomState(seed)
    uids = []
    for _ in range(b):
        n_act = rng.randint(cap // 4, cap // 2)
        u = np.sort(rng.choice(h * h, n_act, replace=False)).astype(np.int32)
        uids.append(np.concatenate([u, np.full(cap - n_act, h * h, np.int32)]))
    uids = np.stack(uids)
    feats = rng.randn(b, cap, 32).astype(np.float32)
    feats[uids >= h * h] = 0.0  # zero padding rows (table invariant)
    addr = np.asarray(asx.packed_addr(jnp.asarray(uids), h, h))
    perm = np.argsort(addr, axis=-1, kind="stable")
    feats_p = np.take_along_axis(feats, perm[..., None], 1)
    uids_p = np.take_along_axis(uids, perm, 1)
    return feats, uids, feats_p, uids_p


def test_densify_packed_direct_matches_linear():
    """Forward + VJP of the packed-direct densify vs the linear-order packed
    densify on the same logical table (bit-identical — it is the same gather
    in a different row order)."""
    h = GRID
    feats, uids, feats_p, uids_p = _linear_table()

    x_l, m_l = asx.densify_packed_batch(
        jnp.asarray(feats), jnp.asarray(uids), (h, h))
    x_p, mp = asx.densify_packed_direct_batch(
        jnp.asarray(feats_p), jnp.asarray(uids_p), (h, h))
    np.testing.assert_array_equal(np.asarray(x_p), np.asarray(x_l))
    # packed mask == pack of the linear mask
    from radardistill_tpu.models.backbone_s2d import pack_mask

    np.testing.assert_array_equal(
        np.asarray(mp.astype(jnp.float32)), np.asarray(pack_mask(m_l)))

    # gradients: d/dfeats_p == permuted d/dfeats
    g = np.random.RandomState(7).randn(*np.asarray(x_l).shape).astype(np.float32)

    def loss_l(f):
        return jnp.sum(asx.densify_packed_batch(f, jnp.asarray(uids), (h, h))[0]
                       * jnp.asarray(g))

    def loss_p(f):
        return jnp.sum(
            asx.densify_packed_direct_batch(f, jnp.asarray(uids_p), (h, h))[0]
            * jnp.asarray(g))

    gl = np.asarray(jax.grad(loss_l)(jnp.asarray(feats)))
    gp = np.asarray(jax.grad(loss_p)(jnp.asarray(feats_p)))
    addr = np.asarray(asx.packed_addr(jnp.asarray(uids), h, h))
    perm = np.argsort(addr, axis=-1, kind="stable")
    np.testing.assert_array_equal(gp, np.take_along_axis(gl, perm[..., None], 1))


@pytest.mark.parametrize("seed", [0, 4])
def test_pillar_encode_packed_cpp_matches_numpy(seed):
    pts, mask = _points(seed=seed)
    a = pillar_encode(pts, mask, PC, VS, (GRID, GRID), CAP, packed=True)
    b = pillar_encode_np(pts, mask, PC, VS, (GRID, GRID), CAP, packed=True)
    for x, y in zip(a[:2], b[:2]):
        np.testing.assert_array_equal(x, y)
    for k in ("ids", "slot", "uids", "count"):
        np.testing.assert_array_equal(a[2][k], b[2][k], err_msg=k)
    np.testing.assert_allclose(a[2]["mean"], b[2]["mean"], rtol=0, atol=0)


def test_pillar_encode_packed_matches_device_vfe():
    """The packed host encode must be bit-identical to the device fallback
    (vfe.encode_table packed_order=True front half)."""
    pts, mask = _points(seed=2)
    _, _, pre = pillar_encode(pts, mask, PC, VS, (GRID, GRID), CAP,
                              packed=True)
    coords, in_range = voxelize.compute_pillar_coords(
        jnp.asarray(pts)[..., :2], PC, VS, (GRID, GRID))
    valid = jnp.asarray(mask) & in_range
    ids = voxelize.pillar_ids(coords, valid, (GRID, GRID))
    key = voxelize.packed_key(ids, (GRID, GRID))
    order = jnp.argsort(key, axis=-1)
    ids_s = jnp.take_along_axis(ids, order, axis=-1)
    uids, slot, count = jax.vmap(
        lambda i: asx.compact_unique_sorted(i, CAP, GRID * GRID))(ids_s)
    np.testing.assert_array_equal(pre["ids"], np.asarray(ids_s))
    np.testing.assert_array_equal(pre["uids"], np.asarray(uids))
    np.testing.assert_array_equal(pre["slot"], np.asarray(slot))
    np.testing.assert_array_equal(pre["count"], np.asarray(count))


def test_s2d_packed_table_matches_dense_input():
    """packed_table backbone on the packed-order VFE table == the standard
    dense entry on the densified grid, shared params — float (tolerance:
    point order changes BN's f32 summation order) and int8_static
    (bit-identical vs the packed-table linear-order entry)."""
    h = 32
    rng = np.random.RandomState(5)
    pts = np.zeros((2, 300, 5), np.float32)
    pts[..., :3] = rng.uniform(-50, 50, (2, 300, 3))
    pts[..., 3:] = rng.uniform(0, 1, (2, 300, 2))
    mask_pts = jnp.asarray(rng.rand(2, 300) > 0.1)
    pts = jnp.asarray(pts)

    kw = dict(capacity=512, num_filters=(32,),
              voxel_size=(108.0 / h, 108.0 / h, 8.0),
              point_cloud_range=(-54.0, -54.0, -5.0, 54.0, 54.0, 3.0),
              grid_size=(h, h))
    vfe_l = DynamicPillarVFESparse(**kw)
    vfe_p = DynamicPillarVFESparse(packed_order=True, **kw)
    vvars = vfe_l.init(jax.random.PRNGKey(0), pts, mask_pts, False)
    table_l, uids_l, _ = vfe_l.apply(vvars, pts, mask_pts, False)
    table_p, uids_p, _ = vfe_p.apply(vvars, pts, mask_pts, False)
    # same pillar set, packed order
    assert set(np.asarray(uids_p[0]).tolist()) == set(np.asarray(uids_l[0]).tolist())

    bev, bmask = jax.vmap(lambda f, u: asx.densify(f, u, (h, h)))(
        table_l, uids_l)

    dense_bb = PillarRes18BackBone8xS2D()
    packed_bb = PillarRes18BackBone8xS2D(table_input=True, hw=(h, h),
                                         packed_table=True)
    variables = dense_bb.init(jax.random.PRNGKey(1), bev, bmask, False)
    out_d = dense_bb.apply(variables, bev, bmask, False,
                           mutable=["batch_stats"])[0]
    out_p = packed_bb.apply(variables, table_p, uids_p, False,
                            mutable=["batch_stats"])[0]
    for k in ("x_conv3", "x_conv4", "x_conv5"):
        np.testing.assert_allclose(
            np.asarray(out_p[k]), np.asarray(out_d[k]), rtol=2e-5, atol=2e-5,
            err_msg=k)
    np.testing.assert_array_equal(
        np.asarray(out_p["mask4"]), np.asarray(out_d["mask4"]))

    # int8_static chain: bit-identical to the linear-order table entry fed
    # the SAME table values (reuse table_l reordered so the q8 bound and
    # every downstream value agree bitwise)
    addr = np.asarray(asx.packed_addr(uids_l, h, h))
    perm = np.argsort(addr, axis=-1, kind="stable")
    table_lp = jnp.take_along_axis(table_l, jnp.asarray(perm)[..., None], 1)
    uids_lp = jnp.take_along_axis(uids_l, jnp.asarray(perm), 1)
    lin_q = PillarRes18BackBone8xS2D(int8_static=True, table_input=True,
                                     hw=(h, h))
    pack_q = PillarRes18BackBone8xS2D(int8_static=True, table_input=True,
                                      hw=(h, h), packed_table=True)
    out_lq = lin_q.apply(variables, table_l, uids_l, False,
                         mutable=["batch_stats"])[0]
    out_pq = pack_q.apply(variables, table_lp, uids_lp, False,
                          mutable=["batch_stats"])[0]
    for k in ("x_conv3", "x_conv4", "x_conv5"):
        np.testing.assert_array_equal(
            np.asarray(out_pq[k]), np.asarray(out_lq[k]), err_msg=k)
