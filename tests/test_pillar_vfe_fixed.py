"""Fixed-size PillarVFE: masking semantics + scatter placement."""

import numpy as np
import jax
import jax.numpy as jnp

from radardistill_tpu.models.vfe import PillarVFE

GRID = (16, 16)
VOX = (0.5, 0.5, 8.0)
PC = (-4.0, -4.0, -5.0, 4.0, 4.0, 3.0)


def test_pillar_vfe_scatter_and_masking():
    rng = np.random.RandomState(0)
    B, V, P, F = 1, 6, 4, 5
    voxels = np.zeros((B, V, P, F), np.float32)
    nums = np.zeros((B, V), np.int32)
    coords = np.full((B, V, 3), -1, np.int32)

    # voxel 0 at (y=2, x=3) with 2 points; voxel 1 at (y=10, x=5) with 4
    for vi, (cy, cx, n) in enumerate([(2, 3, 2), (10, 5, 4)]):
        coords[0, vi] = (0, cy, cx)
        nums[0, vi] = n
        voxels[0, vi, :n, 0] = PC[0] + (cx + 0.5) * VOX[0] + rng.randn(n) * 0.1
        voxels[0, vi, :n, 1] = PC[1] + (cy + 0.5) * VOX[1] + rng.randn(n) * 0.1
        voxels[0, vi, :n, 2] = rng.randn(n)
        voxels[0, vi, :n, 3:] = rng.rand(n, F - 3)

    m = PillarVFE(num_filters=(16,), voxel_size=VOX, point_cloud_range=PC, grid_size=GRID)
    variables = m.init(jax.random.PRNGKey(0), jnp.asarray(voxels), jnp.asarray(nums),
                       jnp.asarray(coords), False)
    bev, mask = m.apply(variables, jnp.asarray(voxels), jnp.asarray(nums),
                        jnp.asarray(coords), False)
    bev, mask = np.asarray(bev), np.asarray(mask)
    assert bev.shape == (1, 16, 16, 16)
    assert mask[0, 2, 3] and mask[0, 10, 5]
    assert mask.sum() == 2
    # empty cells zero
    assert np.all(bev[0][~mask[0]] == 0)
    # padded voxel rows don't leak: same input with extra garbage in padding
    voxels2 = voxels.copy()
    voxels2[0, 2:] = 99.0  # garbage in padded voxels (coords still -1)
    bev2, _ = m.apply(variables, jnp.asarray(voxels2), jnp.asarray(nums),
                      jnp.asarray(coords), False)
    np.testing.assert_allclose(np.asarray(bev2), bev, atol=1e-5)


def test_pillar_vfe_two_layer():
    rng = np.random.RandomState(1)
    voxels = rng.rand(1, 4, 3, 5).astype(np.float32)
    nums = np.array([[3, 2, 1, 0]], np.int32)
    coords = np.array([[[0, 1, 1], [0, 2, 2], [0, 3, 3], [-1, -1, -1]]], np.int32)
    m = PillarVFE(num_filters=(8, 16), voxel_size=VOX, point_cloud_range=PC, grid_size=GRID)
    v = m.init(jax.random.PRNGKey(0), jnp.asarray(voxels), jnp.asarray(nums),
               jnp.asarray(coords), False)
    bev, mask = m.apply(v, jnp.asarray(voxels), jnp.asarray(nums), jnp.asarray(coords), False)
    assert bev.shape[-1] == 16
    assert int(np.asarray(mask).sum()) == 3
