"""Active-site sparse conv primitives vs dense ground truth.

The contract: on matched active sets, the gather-scatter formulation must
reproduce the masked-dense semantics (which round 1 proved equivalent to
reference spconv) bit-for-bit in f32 up to reduction order.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from radardistill_tpu.models.layers import max_pool_mask
from radardistill_tpu.ops import active_site as asx


def _random_active(rng, h, w, n_active):
    ids = rng.choice(h * w, size=n_active, replace=False)
    mask = np.zeros((h, w), bool)
    mask.reshape(-1)[ids] = True
    return np.sort(ids).astype(np.int32), mask


def _dense_conv(x, kernel, stride):
    return jax.lax.conv_general_dilated(
        x[None], kernel, (stride, stride), ((1, 1), (1, 1)),
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
    )[0]


@pytest.mark.parametrize("seed", [0, 1])
def test_subm_conv_matches_masked_dense(seed):
    rng = np.random.RandomState(seed)
    h = w = 24
    ci, co, cap = 8, 16, 64
    ids, mask = _random_active(rng, h, w, 40)
    uids = np.full(cap, h * w, np.int32)
    uids[: len(ids)] = ids
    feats = rng.randn(cap, ci).astype(np.float32)
    feats[len(ids):] = 0.0
    kernel = rng.randn(3, 3, ci, co).astype(np.float32) * 0.1
    bias = rng.randn(co).astype(np.float32) * 0.1

    grid = asx.site_index_grid(jnp.asarray(uids), h * w, cap)
    nb, msk = asx.conv_neighbor_table(jnp.asarray(uids), grid, (h, w), w, 1, cap)
    y_sp = asx.conv3x3_as(jnp.asarray(feats), nb, msk, jnp.asarray(kernel), jnp.asarray(bias))

    # dense: conv over the masked map, read at active sites, add bias there
    x_dense = np.zeros((h, w, ci), np.float32)
    x_dense.reshape(-1, ci)[ids] = feats[: len(ids)]
    y_dense = np.asarray(_dense_conv(jnp.asarray(x_dense), jnp.asarray(kernel), 1)) + bias

    got = np.asarray(y_sp)[: len(ids)]
    want = y_dense.reshape(-1, co)[ids]
    np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-5)
    # padded rows carry bias garbage by design; callers mask. Check msk sanity:
    assert not np.asarray(msk)[:, len(ids):].any()


@pytest.mark.parametrize("seed", [0, 3])
def test_downsample_active_matches_maxpool_rule(seed):
    rng = np.random.RandomState(seed)
    h = w = 32
    ids, mask = _random_active(rng, h, w, 57)
    cap_in, cap_out = 64, 128
    uids = np.full(cap_in, h * w, np.int32)
    uids[: len(ids)] = ids

    out_uids, count = asx.downsample_active(jnp.asarray(uids), (h, w), cap_out)
    want_mask = np.asarray(max_pool_mask(jnp.asarray(mask[None]), 3, 2, 1))[0]
    want_ids = np.nonzero(want_mask.reshape(-1))[0]

    got_ids = np.asarray(out_uids)
    got_ids = got_ids[got_ids < (h // 2) * (w // 2)]
    np.testing.assert_array_equal(np.sort(got_ids), np.sort(want_ids))
    assert int(count) == len(want_ids)


def test_down_conv_matches_dense():
    rng = np.random.RandomState(7)
    h = w = 32
    ci, co, cap_in, cap_out = 8, 8, 64, 128
    ids, mask = _random_active(rng, h, w, 50)
    uids = np.full(cap_in, h * w, np.int32)
    uids[: len(ids)] = ids
    feats = rng.randn(cap_in, ci).astype(np.float32)
    feats[len(ids):] = 0.0
    kernel = rng.randn(3, 3, ci, co).astype(np.float32) * 0.1

    out_uids, _ = asx.downsample_active(jnp.asarray(uids), (h, w), cap_out)
    in_grid = asx.site_index_grid(jnp.asarray(uids), h * w, cap_in)
    nb, msk = asx.conv_neighbor_table(out_uids, in_grid, (h, w), w // 2, 2, cap_in)
    y_sp = asx.conv3x3_as(jnp.asarray(feats), nb, msk, jnp.asarray(kernel))

    x_dense = np.zeros((h, w, ci), np.float32)
    x_dense.reshape(-1, ci)[ids] = feats[: len(ids)]
    y_dense = np.asarray(_dense_conv(jnp.asarray(x_dense), jnp.asarray(kernel), 2))

    got_ids = np.asarray(out_uids)
    n_out = int((got_ids < (h // 2) * (w // 2)).sum())
    got = np.asarray(y_sp)[:n_out]
    want = y_dense.reshape(-1, co)[got_ids[:n_out]]
    np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-5)


def test_densify_sparsify_roundtrip():
    rng = np.random.RandomState(2)
    h = w = 16
    c, cap = 4, 32
    ids, mask = _random_active(rng, h, w, 20)
    bev = np.zeros((h, w, c), np.float32)
    bev.reshape(-1, c)[ids] = rng.randn(len(ids), c)

    feats, uids, count = asx.sparsify(jnp.asarray(bev), jnp.asarray(mask), cap)
    assert int(count) == len(ids)
    dense2, mask2 = asx.densify(feats, uids, (h, w))
    np.testing.assert_allclose(np.asarray(dense2), bev, rtol=1e-6)
    np.testing.assert_array_equal(np.asarray(mask2), mask)


def test_compact_unique_overflow_drops_largest():
    ids = jnp.asarray(np.array([5, 5, 3, 9, 9, 7, 100, 100], np.int32))
    uids, slot, count = asx.compact_unique(ids, cap=3, sentinel=100)
    np.testing.assert_array_equal(np.asarray(uids), [3, 5, 7])
    assert int(count) == 4  # 9 overflowed but is counted
    # slots are aligned with sorted ids [3,5,5,7,9,9,100,100]
    np.testing.assert_array_equal(np.asarray(slot), [0, 1, 1, 2, 3, 3, 3, 3])


def test_compact_unique_overflow_slot_is_dropped():
    # overflowed ids must map to slot == cap (drop), not a valid row
    ids = jnp.asarray(np.array([1, 2, 3, 4], np.int32))
    uids, slot, count = asx.compact_unique(ids, cap=2, sentinel=100)
    np.testing.assert_array_equal(np.asarray(uids), [1, 2])
    np.testing.assert_array_equal(np.asarray(slot), [0, 1, 2, 2])


def test_densify_vjp_matches_autodiff_of_scatter():
    """densify's custom VJP (gather-formulated) must equal the gradient of
    the plain scatter formulation it replaced."""
    rng = np.random.RandomState(7)
    h = w = 12
    c, cap = 3, 24
    ids, mask = _random_active(rng, h, w, 17)
    feats = jnp.asarray(rng.randn(cap, c).astype(np.float32))
    uids = jnp.asarray(
        np.concatenate([np.sort(ids), np.full(cap - len(ids), h * w)]).astype(np.int32)
    )

    def via_densify(f):
        dense, _ = asx.densify(f, uids, (h, w))
        return jnp.sum(jnp.sin(dense) * jnp.arange(h * w * c).reshape(h, w, c))

    def via_scatter(f):
        dense = jnp.zeros((h * w, c), f.dtype).at[uids].set(
            f, mode="drop", indices_are_sorted=True
        ).reshape(h, w, c)
        return jnp.sum(jnp.sin(dense) * jnp.arange(h * w * c).reshape(h, w, c))

    np.testing.assert_allclose(
        float(via_densify(feats)), float(via_scatter(feats)), rtol=1e-5
    )
    g1 = jax.grad(via_densify)(feats)
    g2 = jax.grad(via_scatter)(feats)
    np.testing.assert_allclose(np.asarray(g1), np.asarray(g2), rtol=1e-5, atol=1e-6)


def test_densify_packed_matches_densify_plus_s2d():
    """densify_packed == densify + space_to_depth (fwd) and its custom VJP
    equals autodiff of that reference composition."""
    from radardistill_tpu.models.backbone_s2d import space_to_depth

    rng = np.random.RandomState(11)
    h = w = 16
    c, cap = 5, 40
    ids, mask = _random_active(rng, h, w, 23)
    feats = jnp.asarray(rng.randn(cap, c).astype(np.float32))
    uids = jnp.asarray(
        np.concatenate([np.sort(ids), np.full(cap - len(ids), h * w)]).astype(np.int32)
    )
    cotang = jnp.asarray(rng.randn(h // 2, w // 2, 4 * c).astype(np.float32))

    def ref(f):
        dense, _ = asx.densify(f, uids, (h, w))
        return space_to_depth(dense[None])[0]

    def packed(f):
        return asx.densify_packed(f, uids, (h, w))[0]

    np.testing.assert_allclose(
        np.asarray(packed(feats)), np.asarray(ref(feats)), rtol=1e-6
    )
    g1 = jax.grad(lambda f: jnp.sum(packed(f) * cotang))(feats)
    g2 = jax.grad(lambda f: jnp.sum(ref(f) * cotang))(feats)
    np.testing.assert_allclose(np.asarray(g1), np.asarray(g2), rtol=1e-5, atol=1e-6)

    _, m1 = asx.densify_packed(feats, uids, (h, w))
    _, m2 = asx.densify(feats, uids, (h, w))
    np.testing.assert_array_equal(np.asarray(m1), np.asarray(m2))


def test_densify_batch_matches_vmapped():
    """Flat-batched densify (one 2D gather) == vmapped per-sample densify,
    values and VJP."""
    rng = np.random.RandomState(13)
    h = w = 16
    b, c, cap = 3, 6, 32
    feats = jnp.asarray(rng.randn(b, cap, c).astype(np.float32))
    uids_np = np.full((b, cap), h * w, np.int32)
    for i in range(b):
        k = rng.randint(5, cap)
        uids_np[i, :k] = np.sort(rng.choice(h * w, k, replace=False))
    uids = jnp.asarray(uids_np)
    cot = jnp.asarray(rng.randn(b, h, w, c).astype(np.float32))
    cot_p = jnp.asarray(rng.randn(b, h // 2, w // 2, 4 * c).astype(np.float32))

    def ref(f):
        return jax.vmap(lambda a, u: asx.densify(a, u, (h, w))[0])(f, uids)

    def bat(f):
        return asx.densify_batch(f, uids, (h, w))[0]

    np.testing.assert_allclose(np.asarray(bat(feats)), np.asarray(ref(feats)), rtol=1e-6)
    m1 = asx.densify_batch(feats, uids, (h, w))[1]
    m2 = jax.vmap(lambda a, u: asx.densify(a, u, (h, w))[1])(feats, uids)
    np.testing.assert_array_equal(np.asarray(m1), np.asarray(m2))
    g1 = jax.grad(lambda f: jnp.sum(bat(f) * cot))(feats)
    g2 = jax.grad(lambda f: jnp.sum(ref(f) * cot))(feats)
    np.testing.assert_allclose(np.asarray(g1), np.asarray(g2), rtol=1e-5, atol=1e-6)

    def refp(f):
        return jax.vmap(lambda a, u: asx.densify_packed(a, u, (h, w))[0])(f, uids)

    def batp(f):
        return asx.densify_packed_batch(f, uids, (h, w))[0]

    np.testing.assert_allclose(np.asarray(batp(feats)), np.asarray(refp(feats)), rtol=1e-6)
    g1 = jax.grad(lambda f: jnp.sum(batp(f) * cot_p))(feats)
    g2 = jax.grad(lambda f: jnp.sum(refp(f) * cot_p))(feats)
    np.testing.assert_allclose(np.asarray(g1), np.asarray(g2), rtol=1e-5, atol=1e-6)


# ---------------------------------------------------------------------------
# Inverse tap maps: gather-formulated conv backward (r3 perf item)
# ---------------------------------------------------------------------------


@pytest.mark.parametrize("stride", [1, 2])
def test_invert_taps_consistency(stride):
    rng = np.random.RandomState(7)
    h = w = 24
    cap_in, cap_out = 96, 96
    ids, _ = _random_active(rng, h, w, 61)
    uids = np.full(cap_in, h * w, np.int32)
    uids[: len(ids)] = ids
    grid = asx.site_index_grid(jnp.asarray(uids), h * w, cap_in)
    if stride == 1:
        out_uids = jnp.asarray(uids)
    else:
        out_uids, _ = asx.downsample_active(jnp.asarray(uids), (h, w), cap_out)
    nb, msk = asx.conv_neighbor_table(
        out_uids, grid, (h, w), w // stride, stride, cap_in
    )
    inv, imsk = asx.invert_taps(nb, msk, cap_in)
    nb_n, msk_n = np.asarray(nb), np.asarray(msk)
    inv_n, imsk_n = np.asarray(inv), np.asarray(imsk)
    for k in range(9):
        # ground truth inverse from the forward table
        ref = {}
        for o in range(nb_n.shape[1]):
            if msk_n[k, o]:
                r = nb_n[k, o]
                assert r not in ref, "tap not injective?!"
                ref[r] = o
        for r in range(cap_in):
            if r in ref:
                assert imsk_n[k, r], (k, r)
                assert inv_n[k, r] == ref[r]
            else:
                assert not imsk_n[k, r], (k, r)
        # hole-filled inverse stays monotone (sorted-gather safe)
        assert (np.diff(inv_n[k]) >= 0).all()


@pytest.mark.parametrize("stride", [1, 2])
def test_conv3x3_inv_grad_matches_autodiff(stride):
    """The custom gather-formulated VJP must equal the autodiff scatter-add."""
    rng = np.random.RandomState(11)
    h = w = 24
    cap_in, cap_out = 96, 96
    ids, _ = _random_active(rng, h, w, 57)
    uids = np.full(cap_in, h * w, np.int32)
    uids[: len(ids)] = ids
    feats = jnp.asarray(rng.randn(cap_in, 8).astype(np.float32))
    kernel = jnp.asarray(rng.randn(3, 3, 8, 16).astype(np.float32) * 0.1)
    grid = asx.site_index_grid(jnp.asarray(uids), h * w, cap_in)
    if stride == 1:
        out_uids = jnp.asarray(uids)
    else:
        out_uids, _ = asx.downsample_active(jnp.asarray(uids), (h, w), cap_out)
    nb, msk = asx.conv_neighbor_table(
        out_uids, grid, (h, w), w // stride, stride, cap_in
    )
    inv, imsk = asx.invert_taps(nb, msk, cap_in)
    cot = jnp.asarray(rng.randn(cap_out, 16).astype(np.float32))

    def loss_ref(f):
        return jnp.vdot(asx.conv3x3_as(f, nb, msk, kernel), cot)

    def loss_inv(f):
        return jnp.vdot(asx.conv3x3_as(f, nb, msk, kernel, inv=inv, imsk=imsk), cot)

    y_ref, g_ref = jax.value_and_grad(loss_ref)(feats)
    y_inv, g_inv = jax.value_and_grad(loss_inv)(feats)
    np.testing.assert_allclose(float(y_ref), float(y_inv), rtol=1e-6)
    np.testing.assert_allclose(np.asarray(g_ref), np.asarray(g_inv), rtol=1e-5, atol=1e-6)


def test_conv3x3_as_b_matches_per_sample():
    """Flat-batched conv (one 2D gather per direction) == vmapped per-sample
    conv, values and feature grads."""
    rng = np.random.RandomState(5)
    h = w = 24
    cap = 96
    b = 3
    feats_l, nb_l, msk_l, inv_l, imsk_l = [], [], [], [], []
    for s in range(b):
        ids, _ = _random_active(np.random.RandomState(40 + s), h, w, 30 + 9 * s)
        uids = np.full(cap, h * w, np.int32)
        uids[: len(ids)] = ids
        grid = asx.site_index_grid(jnp.asarray(uids), h * w, cap)
        nb, msk = asx.conv_neighbor_table(jnp.asarray(uids), grid, (h, w), w, 1, cap)
        inv, imsk = asx.invert_taps(nb, msk, cap)
        f = rng.randn(cap, 8).astype(np.float32)
        f[len(ids):] = 0
        feats_l.append(f); nb_l.append(nb); msk_l.append(msk)
        inv_l.append(inv); imsk_l.append(imsk)
    feats = jnp.asarray(np.stack(feats_l))
    tap = tuple(jnp.stack(t) for t in (nb_l, msk_l, inv_l, imsk_l))
    kernel = jnp.asarray(rng.randn(3, 3, 8, 16).astype(np.float32) * 0.1)
    bias = jnp.asarray(rng.randn(16).astype(np.float32) * 0.1)
    cot = jnp.asarray(rng.randn(b, cap, 16).astype(np.float32))

    def loss_b(f):
        return jnp.vdot(asx.conv3x3_as_b(f, tap, kernel, bias), cot)

    def loss_ps(f):
        y = jax.vmap(
            lambda fi, n, m, i, im: asx.conv3x3_as(fi, n, m, kernel, bias, inv=i, imsk=im)
        )(f, *tap)
        return jnp.vdot(y, cot)

    yb, gb = jax.value_and_grad(loss_b)(feats)
    yp, gp = jax.value_and_grad(loss_ps)(feats)
    np.testing.assert_allclose(float(yb), float(yp), rtol=1e-6)
    np.testing.assert_allclose(np.asarray(gb), np.asarray(gp), rtol=1e-5, atol=1e-6)


def test_conv_neighbor_table_b_matches_per_sample():
    rng = np.random.RandomState(9)
    h = w = 24
    cap = 96
    uids_l, grids = [], []
    for s in range(3):
        ids, _ = _random_active(np.random.RandomState(60 + s), h, w, 25 + 11 * s)
        uids = np.full(cap, h * w, np.int32)
        uids[: len(ids)] = ids
        uids_l.append(jnp.asarray(uids))
        grids.append(asx.site_index_grid(jnp.asarray(uids), h * w, cap))
    uids_b, grid_b = jnp.stack(uids_l), jnp.stack(grids)
    for stride in (1, 2):
        if stride == 1:
            outs = uids_b
        else:
            outs = jnp.stack([
                asx.downsample_active(u, (h, w), cap)[0] for u in uids_l
            ])
        nb_b, msk_b = asx.conv_neighbor_table_b(
            outs, grid_b, (h, w), w // stride, stride, cap
        )
        for i in range(3):
            nb, msk = asx.conv_neighbor_table(
                outs[i], grids[i], (h, w), w // stride, stride, cap
            )
            np.testing.assert_array_equal(np.asarray(nb_b[i]), np.asarray(nb))
            np.testing.assert_array_equal(np.asarray(msk_b[i]), np.asarray(msk))


def test_invert_taps_b_matches_per_sample():
    rng = np.random.RandomState(21)
    h = w = 24
    cap = 96
    nb_l, msk_l = [], []
    for s in range(3):
        ids, _ = _random_active(np.random.RandomState(80 + s), h, w, 20 + 13 * s)
        uids = np.full(cap, h * w, np.int32)
        uids[: len(ids)] = ids
        grid = asx.site_index_grid(jnp.asarray(uids), h * w, cap)
        nb, msk = asx.conv_neighbor_table(jnp.asarray(uids), grid, (h, w), w, 1, cap)
        nb_l.append(nb); msk_l.append(msk)
    nb_b, msk_b = jnp.stack(nb_l), jnp.stack(msk_l)
    inv_b, imsk_b = asx.invert_taps_b(nb_b, msk_b, cap)
    for i in range(3):
        inv, imsk = asx.invert_taps(nb_l[i], msk_l[i], cap)
        np.testing.assert_array_equal(np.asarray(inv_b[i]), np.asarray(inv))
        np.testing.assert_array_equal(np.asarray(imsk_b[i]), np.asarray(imsk))
