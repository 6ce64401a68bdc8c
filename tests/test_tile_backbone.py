"""Tile-sparse backbone must reproduce the masked-dense backbone exactly
(same params, sparse input, sufficient tile capacity)."""

import numpy as np
import jax
import jax.numpy as jnp

from radardistill_tpu.models.backbone_sparse2d import PillarRes18BackBone8x
from radardistill_tpu.models.backbone_tile_sparse import PillarRes18BackBone8xTileSparse

GRID = 64  # /16 = 4


def map_params(dense_p):
    """dense param layout -> tile-sparse param layout."""
    tile_p = {}
    for stage in (1, 2, 3, 4):
        sp = {}
        for blk in (0, 1):
            d = dense_p[f"conv{stage}_{blk}"]
            for ci in (1, 2):
                sp[f"b{blk}_conv{ci}_kernel"] = d[f"conv{ci}"]["conv"]["kernel"]
                sp[f"b{blk}_conv{ci}_bias"] = d[f"conv{ci}"]["conv"]["bias"]
                sp[f"b{blk}_bn{ci}"] = dict(d[f"bn{ci}"])
        tile_p[f"stage{stage}"] = sp
        if stage > 1:
            down = dense_p[f"conv{stage}_down"]
            tile_p[f"down{stage}_conv"] = {"conv": down["conv"]["conv"]}
            tile_p[f"down{stage}_bn"] = dict(down["bn"])
    for k in ("conv5_down_conv", "conv5_down_bn", "conv5_0", "conv5_1"):
        tile_p[k] = dense_p[k]
    return tile_p


def map_stats(dense_s):
    tile_s = {}
    for stage in (1, 2, 3, 4):
        sp = {}
        for blk in (0, 1):
            d = dense_s[f"conv{stage}_{blk}"]
            for ci in (1, 2):
                sp[f"b{blk}_bn{ci}"] = dict(d[f"bn{ci}"])
        tile_s[f"stage{stage}"] = sp
        if stage > 1:
            tile_s[f"down{stage}_bn"] = dict(dense_s[f"conv{stage}_down"]["bn"])
    for k in ("conv5_down_bn", "conv5_0", "conv5_1"):
        tile_s[k] = dense_s[k]
    return tile_s


def test_tile_backbone_matches_dense():
    rng = np.random.RandomState(0)
    bev = np.zeros((1, GRID, GRID, 32), np.float32)
    mask = np.zeros((1, GRID, GRID), bool)
    # two sparse clusters
    mask[0, 5:12, 8:14] = True
    mask[0, 40:44, 50:60] = True
    bev[mask] = rng.randn(mask.sum(), 32).astype(np.float32)

    dense = PillarRes18BackBone8x()
    dv = dense.init(jax.random.PRNGKey(0), jnp.asarray(bev), jnp.asarray(mask), False)

    tile = PillarRes18BackBone8xTileSparse(tile=16, max_tiles=16)
    tvars = {
        "params": map_params(dv["params"]),
        "batch_stats": map_stats(dv["batch_stats"]),
    }
    # validate the mapped tree matches what init would produce
    t_init = tile.init(jax.random.PRNGKey(1), jnp.asarray(bev), jnp.asarray(mask), False)

    def paths(t):
        return set(jax.tree_util.keystr(p) for p, _ in
                   jax.tree_util.tree_flatten_with_path(t)[0])

    assert paths(t_init["params"]) == paths(tvars["params"])

    out_d = dense.apply(dv, jnp.asarray(bev), jnp.asarray(mask), False)
    out_t = tile.apply(tvars, jnp.asarray(bev), jnp.asarray(mask), False)

    # both paths emit zeros off the active set and identical values on it
    for key in ("x_conv1", "x_conv2", "x_conv3", "x_conv4", "x_conv5"):
        a, b = np.asarray(out_d[key]), np.asarray(out_t[key])
        np.testing.assert_allclose(a, b, rtol=2e-3, atol=2e-3)


def test_tile_backbone_train_mode_runs():
    rng = np.random.RandomState(1)
    bev = jnp.asarray(rng.randn(1, GRID, GRID, 32).astype(np.float32))
    mask = jnp.asarray(rng.rand(1, GRID, GRID) > 0.95)
    tile = PillarRes18BackBone8xTileSparse(tile=16, max_tiles=20)
    v = tile.init(jax.random.PRNGKey(0), bev, mask, True)
    out, updated = tile.apply(v, bev, mask, True, mutable=["batch_stats"])
    assert np.all(np.isfinite(np.asarray(out["x_conv5"])))
