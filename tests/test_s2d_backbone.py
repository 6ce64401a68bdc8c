"""Space-to-depth backbone == dense masked backbone, exactly (same params)."""

import numpy as np
import jax
import jax.numpy as jnp

from radardistill_tpu.models.backbone_sparse2d import PillarRes18BackBone8x
from radardistill_tpu.models.backbone_s2d import (
    PillarRes18BackBone8xS2D,
    depth_to_space,
    pack_down_kernel,
    pack_subm_kernel,
    space_to_depth,
)


def test_space_to_depth_roundtrip():
    rng = np.random.RandomState(0)
    x = jnp.asarray(rng.randn(2, 8, 8, 5).astype(np.float32))
    p = space_to_depth(x)
    assert p.shape == (2, 4, 4, 20)
    np.testing.assert_array_equal(np.asarray(depth_to_space(p, 5)), np.asarray(x))
    # phase-major channel order: packed[..., phase*c + ch] = x[2i+py, 2j+px, ch]
    np.testing.assert_array_equal(
        np.asarray(p[0, 1, 2, 3 * 5 + 4]), np.asarray(x[0, 3, 5, 4])
    )


def _conv(x, k, stride, pad):
    return jax.lax.conv_general_dilated(
        x, k, (stride, stride), ((pad, pad), (pad, pad)),
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
    )


def test_packed_subm_kernel_equivalence():
    rng = np.random.RandomState(1)
    cin, cout = 3, 4
    x = jnp.asarray(rng.randn(2, 12, 12, cin).astype(np.float32))
    k = jnp.asarray(rng.randn(3, 3, cin, cout).astype(np.float32))
    want = _conv(x, k, 1, 1)
    kp = pack_subm_kernel(k, cin, cout)
    got = depth_to_space(_conv(space_to_depth(x), kp, 1, 1), cout)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), rtol=1e-5, atol=1e-5)


def test_packed_down_kernel_equivalence():
    rng = np.random.RandomState(2)
    cin, cout = 3, 4
    x = jnp.asarray(rng.randn(2, 12, 12, cin).astype(np.float32))
    k = jnp.asarray(rng.randn(3, 3, cin, cout).astype(np.float32))
    want = _conv(x, k, 2, 1)  # stride-2 pad-1 -> (2, 6, 6, cout)
    kp = pack_down_kernel(k, cin, cout)
    got = jax.lax.conv_general_dilated(
        space_to_depth(x), kp, (1, 1), ((1, 0), (1, 0)),
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
    )
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), rtol=1e-5, atol=1e-5)


def test_s2d_backbone_matches_dense():
    rng = np.random.RandomState(3)
    b, hw, c = 2, 32, 32
    bev = jnp.asarray(rng.randn(b, hw, hw, c).astype(np.float32))
    mask = jnp.asarray(rng.rand(b, hw, hw) > 0.6)

    dense = PillarRes18BackBone8x()
    s2d = PillarRes18BackBone8xS2D(unpack_outputs=True)
    variables = dense.init(jax.random.PRNGKey(0), bev, mask, True)

    for train in (True, False):
        out_d, mut_d = dense.apply(variables, bev, mask, train, mutable=["batch_stats"])
        out_s, mut_s = s2d.apply(variables, bev, mask, train, mutable=["batch_stats"])
        for key in ("x_conv1", "x_conv2", "x_conv3", "x_conv4", "x_conv5"):
            np.testing.assert_allclose(
                np.asarray(out_s[key]), np.asarray(out_d[key]),
                rtol=2e-4, atol=2e-4, err_msg=f"{key} train={train}",
            )
        for key in ("mask2", "mask3", "mask4"):
            np.testing.assert_array_equal(np.asarray(out_s[key]), np.asarray(out_d[key]))
        # running-stat updates agree
        leaves_d = jax.tree.leaves(mut_d["batch_stats"])
        leaves_s = jax.tree.leaves(mut_s["batch_stats"])
        for a, bb in zip(leaves_s, leaves_d):
            np.testing.assert_allclose(np.asarray(a), np.asarray(bb), rtol=1e-4, atol=1e-5)


def test_s2d_param_tree_identical():
    rng = np.random.RandomState(4)
    bev = jnp.asarray(rng.randn(1, 16, 16, 32).astype(np.float32))
    mask = jnp.ones((1, 16, 16), bool)
    vd = PillarRes18BackBone8x().init(jax.random.PRNGKey(0), bev, mask, False)
    vs = PillarRes18BackBone8xS2D().init(jax.random.PRNGKey(0), bev, mask, False)
    fd = jax.tree_util.tree_flatten_with_path(vd["params"])[0]
    fs = jax.tree_util.tree_flatten_with_path(vs["params"])[0]
    paths_d = {jax.tree_util.keystr(p): v.shape for p, v in fd}
    paths_s = {jax.tree_util.keystr(p): v.shape for p, v in fs}
    assert paths_d == paths_s
    # identical init values too (same paths -> same RNG folds)
    for (p, a), (_, b) in zip(sorted(fd, key=lambda t: jax.tree_util.keystr(t[0])),
                              sorted(fs, key=lambda t: jax.tree_util.keystr(t[0]))):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b), err_msg=jax.tree_util.keystr(p))


def test_packed_down_kernel_packed_out_equivalence():
    rng = np.random.RandomState(5)
    cin, cout = 3, 4
    x = jnp.asarray(rng.randn(2, 16, 16, cin).astype(np.float32))
    k = jnp.asarray(rng.randn(3, 3, cin, cout).astype(np.float32))
    want = _conv(x, k, 2, 1)  # (2, 8, 8, cout) on the orig grid
    from radardistill_tpu.models.backbone_s2d import pack_down_kernel_packed_out
    kp = pack_down_kernel_packed_out(k, cin, cout)
    got_p = jax.lax.conv_general_dilated(
        space_to_depth(x), kp, (2, 2), ((1, 1), (1, 1)),
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
    )  # (2, 4, 4, 4*cout) packed
    got = depth_to_space(got_p, cout)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), rtol=1e-5, atol=1e-5)


def test_s2d_stage2_packed_matches_dense():
    rng = np.random.RandomState(6)
    b, hw, c = 2, 32, 32
    bev = jnp.asarray(rng.randn(b, hw, hw, c).astype(np.float32))
    mask = jnp.asarray(rng.rand(b, hw, hw) > 0.6)
    dense = PillarRes18BackBone8x()
    s2d2 = PillarRes18BackBone8xS2D(unpack_outputs=True, pack_stage2=True)
    variables = dense.init(jax.random.PRNGKey(0), bev, mask, True)
    for train in (True, False):
        out_d, _ = dense.apply(variables, bev, mask, train, mutable=["batch_stats"])
        out_s, _ = s2d2.apply(variables, bev, mask, train, mutable=["batch_stats"])
        for key in ("x_conv1", "x_conv2", "x_conv3", "x_conv4", "x_conv5"):
            np.testing.assert_allclose(
                np.asarray(out_s[key]), np.asarray(out_d[key]),
                rtol=2e-4, atol=2e-4, err_msg=f"{key} train={train}",
            )


def test_s2d_table_input_matches_dense_input():
    """Table-input mode (sparse VFE table -> packed densify inside the
    backbone) must equal feeding the densified grid through the standard
    (bev, mask) entry on shared params."""
    import numpy as np
    from radardistill_tpu.models.vfe import DynamicPillarVFESparse
    from radardistill_tpu.ops import active_site as asx

    h = 32
    rng = np.random.RandomState(5)
    pts = np.zeros((2, 300, 5), np.float32)
    pts[..., :3] = rng.uniform(-50, 50, (2, 300, 3))
    pts[..., 3:] = rng.uniform(0, 1, (2, 300, 2))
    mask_pts = jnp.asarray(rng.rand(2, 300) > 0.1)
    pts = jnp.asarray(pts)

    vfe = DynamicPillarVFESparse(
        capacity=512, num_filters=(32,), voxel_size=(108.0 / h, 108.0 / h, 8.0),
        point_cloud_range=(-54.0, -54.0, -5.0, 54.0, 54.0, 3.0),
        grid_size=(h, h),
    )
    vvars = vfe.init(jax.random.PRNGKey(0), pts, mask_pts, False)
    table, uids, _ = vfe.apply(vvars, pts, mask_pts, False)
    bev, bmask = jax.vmap(lambda f, u: asx.densify(f, u, (h, h)))(table, uids)

    dense_bb = PillarRes18BackBone8xS2D()
    table_bb = PillarRes18BackBone8xS2D(table_input=True, hw=(h, h))
    variables = dense_bb.init(jax.random.PRNGKey(1), bev, bmask, False)

    out_d = dense_bb.apply(variables, bev, bmask, False, mutable=["batch_stats"])[0]
    out_t = table_bb.apply(variables, table, uids, False, mutable=["batch_stats"])[0]
    for k in ("x_conv3", "x_conv4", "x_conv5"):
        np.testing.assert_allclose(
            np.asarray(out_t[k]), np.asarray(out_d[k]), rtol=1e-5, atol=1e-5
        )
    np.testing.assert_array_equal(np.asarray(out_t["mask4"]), np.asarray(out_d["mask4"]))

    # int8_static: the table-input path quantizes the COMPACT table BEFORE
    # the packed densify (4x fewer gathered bytes). q8 is elementwise with a
    # scalar bound and q8(0) = 0, so it commutes with the zero-filling
    # gather — outputs must be BIT-identical to the dense-entry chain.
    dense_q = PillarRes18BackBone8xS2D(int8_static=True)
    table_q = PillarRes18BackBone8xS2D(int8_static=True, table_input=True,
                                       hw=(h, h))
    out_dq = dense_q.apply(variables, bev, bmask, False, mutable=["batch_stats"])[0]
    out_tq = table_q.apply(variables, table, uids, False, mutable=["batch_stats"])[0]
    for k in ("x_conv3", "x_conv4", "x_conv5"):
        np.testing.assert_array_equal(
            np.asarray(out_tq[k]), np.asarray(out_dq[k]), err_msg=k)


