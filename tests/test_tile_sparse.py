"""Tile-sparse gather/scatter: a sparse conv through tiles must equal the
masked-dense conv on the full map."""

import numpy as np
import jax
import jax.numpy as jnp

from radardistill_tpu.ops import tile_sparse


def test_tile_activity_and_select():
    mask = np.zeros((2, 16, 16), bool)
    mask[0, 0, 0] = True
    mask[1, 9, 12] = True
    act = np.asarray(tile_sparse.tile_activity(jnp.asarray(mask), 8))
    assert act.shape == (2, 2, 2)
    assert act[0, 0, 0] and act[1, 1, 1] and act.sum() == 2
    ids, valid, overflow = tile_sparse.select_tiles(jnp.asarray(act), 4)
    assert int(valid.sum()) == 2 and not bool(overflow)


def test_gather_scatter_roundtrip():
    rng = np.random.RandomState(0)
    x = rng.randn(2, 16, 16, 4).astype(np.float32)
    mask = np.zeros((2, 16, 16), bool)
    mask[0, 2:5, 3:6] = True
    mask[1, 10:12, 1:3] = True
    xm = x * mask[..., None]

    act = tile_sparse.tile_activity(jnp.asarray(mask), 8)
    ids, valid, _ = tile_sparse.select_tiles(act, 4)
    patches = tile_sparse.gather_tiles(jnp.asarray(xm), ids, valid, 8, halo=0)
    back = tile_sparse.scatter_tiles(patches, ids, valid, (2, 16, 16, 4))
    np.testing.assert_allclose(np.asarray(back), xm, atol=1e-6)


def test_tile_conv_equals_dense_conv():
    """conv3x3(masked input) restricted to active tiles == dense conv."""
    rng = np.random.RandomState(1)
    x = rng.randn(1, 32, 32, 8).astype(np.float32)
    w = rng.randn(3, 3, 8, 16).astype(np.float32)
    mask = np.zeros((1, 32, 32), bool)
    mask[0, 4:10, 6:12] = True
    mask[0, 20:23, 25:29] = True
    xm = jnp.asarray(x * mask[..., None])

    dense = jax.lax.conv_general_dilated(
        xm, jnp.asarray(w), (1, 1), ((1, 1), (1, 1)),
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
    )
    # dense output restricted to active tiles (scatter writes only those)
    act = tile_sparse.tile_activity(jnp.asarray(mask), 8)
    ids, valid, _ = tile_sparse.select_tiles(act, 6)
    patches = tile_sparse.gather_tiles(xm, ids, valid, 8, halo=1)
    out_patches = jax.lax.conv_general_dilated(
        patches, jnp.asarray(w), (1, 1), "VALID",
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
    )
    got = tile_sparse.scatter_tiles(out_patches, ids, valid, (1, 32, 32, 16))

    tile_mask = np.kron(np.asarray(act)[0], np.ones((8, 8), bool))
    np.testing.assert_allclose(
        np.asarray(got)[0][tile_mask], np.asarray(dense)[0][tile_mask], atol=1e-4
    )
    # outside active tiles scatter leaves zeros
    assert np.all(np.asarray(got)[0][~tile_mask] == 0)


def test_overflow_flag():
    mask = np.ones((1, 16, 16), bool)
    act = tile_sparse.tile_activity(jnp.asarray(mask), 8)
    ids, valid, overflow = tile_sparse.select_tiles(act, 2)
    assert bool(overflow)
    assert int(valid.sum()) == 2
