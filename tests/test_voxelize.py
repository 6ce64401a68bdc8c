import numpy as np
import jax.numpy as jnp

from radardistill_tpu.ops import voxelize
from tests import reference_impls as ref

PC_RANGE = [-8.0, -8.0, -5.0, 8.0, 8.0, 3.0]
VOXEL = [0.5, 0.5, 8.0]
GRID = (32, 32)  # nx, ny


def make_points(n=500, seed=0):
    rng = np.random.RandomState(seed)
    pts = rng.uniform(-10, 10, (n, 5)).astype(np.float32)  # some out of range
    pts[:, 2] = rng.uniform(-3, 2, n)
    return pts


def test_scatter_max_matches_reference():
    pts = make_points()
    coords, ok = voxelize.compute_pillar_coords(jnp.asarray(pts[:, :2]), PC_RANGE, VOXEL, GRID)
    ids = voxelize.pillar_ids(coords, ok, GRID)
    bev = np.asarray(voxelize.scatter_max_bev(jnp.asarray(pts), ids, GRID))
    want, cnt = ref.dynamic_pillar_reduce(pts, PC_RANGE, VOXEL, GRID, mode="max")
    # empty pillars are 0 in ours; reference leaves 0 as well
    np.testing.assert_allclose(bev, want, atol=1e-5)


def test_counts_and_mean_gather():
    pts = make_points(seed=1)
    coords, ok = voxelize.compute_pillar_coords(jnp.asarray(pts[:, :2]), PC_RANGE, VOXEL, GRID)
    ids = voxelize.pillar_ids(coords, ok, GRID)
    cnt = np.asarray(voxelize.pillar_count(ids, GRID))
    _, want_cnt = ref.dynamic_pillar_reduce(pts, PC_RANGE, VOXEL, GRID)
    np.testing.assert_allclose(cnt, want_cnt)

    mean_back = np.asarray(
        voxelize.pillar_mean_per_point(jnp.asarray(pts[:, :3]), ids, GRID)
    )
    sums, _ = ref.dynamic_pillar_reduce(pts[:, :3], PC_RANGE, VOXEL, GRID, mode="sum")
    ids_np = np.asarray(ids)
    ok_np = np.asarray(ok)
    nx, ny = GRID
    for i in range(len(pts)):
        if not ok_np[i]:
            continue
        cy, cx = ids_np[i] // nx, ids_np[i] % nx
        want = sums[cy, cx] / want_cnt[cy, cx]
        np.testing.assert_allclose(mean_back[i], want, atol=1e-5)


def test_padded_points_are_ignored():
    pts = make_points(seed=2)
    mask = np.ones(len(pts), bool)
    mask[100:] = False  # pretend padding
    coords, ok = voxelize.compute_pillar_coords(jnp.asarray(pts[:, :2]), PC_RANGE, VOXEL, GRID)
    ids = voxelize.pillar_ids(coords, jnp.asarray(mask) & ok, GRID)
    bev = np.asarray(voxelize.scatter_max_bev(jnp.asarray(pts), ids, GRID))
    want, _ = ref.dynamic_pillar_reduce(pts[:100], PC_RANGE, VOXEL, GRID, mode="max")
    np.testing.assert_allclose(bev, want, atol=1e-5)
