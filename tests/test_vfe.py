"""VFE feature-construction parity vs a numpy transcription of
DynamicPillarVFESimple2D (dynamic_pillar_vfe.py:195-252)."""

import numpy as np
import jax
import jax.numpy as jnp

from radardistill_tpu.models.vfe import DynamicPillarVFESimple2D
from radardistill_tpu.ops import voxelize

PC = (-8.0, -8.0, -5.0, 8.0, 8.0, 3.0)
VOX = (0.5, 0.5, 8.0)
GRID = (32, 32)


def numpy_point_features(points):
    """[f_center, abs(x,y,z,extras), f_cluster, f_relative] per the reference."""
    vx, vy, vz = VOX
    x_off, y_off, z_off = vx / 2 + PC[0], vy / 2 + PC[1], vz / 2 + PC[2]
    coords = np.floor((points[:, :2] - np.array(PC[:2])) / np.array(VOX[:2])).astype(int)
    ok = (coords >= 0).all(1) & (coords[:, 0] < GRID[0]) & (coords[:, 1] < GRID[1])
    pts = points[ok]
    coords = coords[ok]
    # cluster mean per pillar
    key = coords[:, 1] * GRID[0] + coords[:, 0]
    mean = np.zeros((len(pts), 3))
    for k in np.unique(key):
        m = key == k
        mean[m] = pts[m, :3].mean(axis=0)
    f_center = np.stack([
        pts[:, 0] - (coords[:, 0] * vx + x_off),
        pts[:, 1] - (coords[:, 1] * vy + y_off),
        pts[:, 2] - z_off,
    ], 1)
    f_cluster = pts[:, :3] - mean
    f_rel = pts[:, :3] - np.array(PC[:3])
    return np.concatenate([f_center, pts, f_cluster, f_rel], 1), ok


def test_point_features_match_reference():
    rng = np.random.RandomState(0)
    pts = rng.uniform(-9, 9, (300, 5)).astype(np.float32)
    mask = np.ones(300, bool)
    mask[250:] = False

    m = DynamicPillarVFESimple2D(
        num_filters=(32,), voxel_size=VOX, point_cloud_range=PC, grid_size=GRID
    )
    coords, in_range = voxelize.compute_pillar_coords(
        jnp.asarray(pts[None, :, :2]), PC, VOX, GRID
    )
    valid = jnp.asarray(mask[None]) & in_range
    ids = voxelize.pillar_ids(coords, valid, GRID)
    got = np.asarray(m.build_point_features(jnp.asarray(pts[None]), valid, ids))[0]

    want, ok = numpy_point_features(pts[:250])
    got_valid = got[np.asarray(valid)[0]]
    np.testing.assert_allclose(got_valid, want, atol=1e-4)
    # padded/out-of-range rows are zeroed
    np.testing.assert_array_equal(got[~np.asarray(valid)[0]], 0.0)


def test_full_vfe_pillar_max_semantics():
    """End-to-end VFE: each pillar's feature = max over its points of the
    post-linear/BN/relu point features (PFNLayerV2 scatter_max)."""
    rng = np.random.RandomState(1)
    pts = rng.uniform(-7, 7, (100, 5)).astype(np.float32)
    m = DynamicPillarVFESimple2D(
        num_filters=(32,), voxel_size=VOX, point_cloud_range=PC, grid_size=GRID
    )
    variables = m.init(jax.random.PRNGKey(0), jnp.asarray(pts[None]), jnp.ones((1, 100), bool), False)
    bev, pmask = m.apply(variables, jnp.asarray(pts[None]), jnp.ones((1, 100), bool), False)
    bev, pmask = np.asarray(bev)[0], np.asarray(pmask)[0]

    coords = np.floor((pts[:, :2] - np.array(PC[:2])) / np.array(VOX[:2])).astype(int)
    occupied = set((c[1], c[0]) for c in coords)
    got_occ = set(zip(*np.nonzero(pmask)))
    assert got_occ == occupied
    # empty pillars are exactly zero
    assert np.all(bev[~pmask] == 0)
    # occupied pillars have non-negative (post-relu max) features
    assert np.all(bev[pmask] >= 0)


def test_vfe_dtype_policy():
    """With a bf16 compute dtype the scatter GRID is bf16 (the byte hog) but
    raw f32 points feed the feature assembly at full precision; BN running
    stats stay f32."""
    rng = np.random.RandomState(2)
    pts = jnp.asarray(rng.uniform(-7, 7, (1, 64, 5)).astype(np.float32))
    mask = jnp.ones((1, 64), bool)
    m = DynamicPillarVFESimple2D(
        num_filters=(32,), voxel_size=VOX, point_cloud_range=PC, grid_size=GRID,
        dtype=jnp.bfloat16,
    )
    variables = m.init(jax.random.PRNGKey(0), pts, mask, False)
    bev, _ = m.apply(variables, pts, mask, False)
    assert bev.dtype == jnp.bfloat16
    for leaf in jax.tree.leaves(variables["batch_stats"]):
        assert leaf.dtype == jnp.float32
    # numerics match the f32 path to bf16 tolerance
    m32 = DynamicPillarVFESimple2D(
        num_filters=(32,), voxel_size=VOX, point_cloud_range=PC, grid_size=GRID
    )
    bev32, _ = m32.apply(variables, pts, mask, False)
    np.testing.assert_allclose(
        np.asarray(bev, np.float32), np.asarray(bev32), rtol=2e-2, atol=2e-2
    )
