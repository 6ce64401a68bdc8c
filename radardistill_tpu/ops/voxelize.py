"""Point → pillar reduction on a dense BEV grid, static shapes.

TPU-native replacement for the reference's dynamic pillar front-end
(reference: pcdet/models/backbones_3d/vfe/dynamic_pillar_vfe.py:195-252 —
floor-divide coords, `torch.unique(return_inverse)`, `torch_scatter`
scatter_mean/scatter_max, then sparse coords).

Key re-design: on TPU there is no reason to deduplicate pillar ids — the
dense BEV grid itself is the segment-id space. Each point gets a linear id
``y * W + x`` (invalid/padded points get a sentinel id = H*W), and
``jax.ops.segment_{sum,max}`` reduces straight into the (H*W(+1), C) grid
which reshapes to the dense BEV tensor the backbone consumes. The
`unq_inv` gather-back of the reference becomes a plain gather from the grid.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def compute_pillar_coords(points_xy, pc_range, voxel_size, grid_size):
    """Per-point integer pillar coords + in-range validity.

    Args:
        points_xy: (..., 2) world x, y.
        pc_range: (6,) [x_min, y_min, z_min, x_max, y_max, z_max].
        voxel_size: (2+,) [vx, vy, ...].
        grid_size: (nx, ny) static ints.
    Returns:
        (coords_xy int32 (..., 2), in_range bool (...,)).

    Matches dynamic_pillar_vfe.py:201-205 (floor then bounds mask).
    """
    pc_range = jnp.asarray(pc_range, points_xy.dtype)
    voxel_size = jnp.asarray(voxel_size, points_xy.dtype)
    coords = jnp.floor((points_xy - pc_range[:2]) / voxel_size[:2]).astype(jnp.int32)
    nx, ny = grid_size
    in_range = (
        (coords[..., 0] >= 0)
        & (coords[..., 0] < nx)
        & (coords[..., 1] >= 0)
        & (coords[..., 1] < ny)
    )
    return coords, in_range


def pillar_ids(coords_xy, valid, grid_size):
    """Linear pillar id in row-major (y, x) BEV layout; invalid -> sentinel.

    The dense BEV tensor is laid out (H=ny rows, W=nx cols) so that
    ``bev[b, y, x]`` matches the reference SparseConvTensor spatial_shape
    ``grid_size[[1, 0]]`` with indices ``[b, y, x]``
    (spconv_backbone_2d.py:213, dynamic_pillar_vfe.py:243-248).
    """
    nx, ny = grid_size
    ids = coords_xy[..., 1] * nx + coords_xy[..., 0]
    return jnp.where(valid, ids, nx * ny)


def packed_key(ids, grid_size):
    """Space-to-depth sort key for linear pillar ids: parent-major order
    ``((y//2)*(nx//2) + x//2)*4 + (y%2)*2 + x%2`` (the exact lane order of
    backbone_s2d.space_to_depth). A bijection on [0, nx*ny); the sentinel
    nx*ny maps to itself (still sorts after every valid key).

    Sorting the LIDAR pillar table by this key (id VALUES stay linear) makes
    the S2D entry's inverse site map a directly-packed monotone scatter —
    no (H,W)->(H/2,W/2,4) transpose of the 16.6 MB index grid and no
    pack_mask transpose (r5 profile: 3.2 + ~1.8 ms/step of relayouts around
    the entry densify). Requires even nx.
    """
    nx, ny = grid_size
    assert nx % 2 == 0, nx
    sent = nx * ny
    y = ids // nx
    x = ids - y * nx
    key = (((y >> 1) * (nx >> 1) + (x >> 1)) << 2) + ((y & 1) << 1) + (x & 1)
    return jnp.where(ids >= sent, ids, key)


def scatter_max_bev(feats, ids, grid_size):
    """Per-sample scatter-max into the dense grid.

    Args:
        feats: (N, C) per-point features (padded points allowed; their id must
            be the sentinel).
        ids: (N,) linear pillar ids in [0, H*W] (H*W = sentinel; out-of-range
            updates are DROPPED by the scatter, no sentinel row materialized).
        grid_size: (nx, ny).
    Returns:
        bev (H, W, C) with empty pillars = 0 (matching scatter_max over an
        empty segment never being read in the reference — empty sites simply
        don't exist in the sparse tensor, i.e. are 0 after `.dense()`).
    """
    nx, ny = grid_size
    c = feats.shape[-1]
    # sort points by pillar id: TPU lowers unsorted scatters to a serialized
    # custom-call (~2 GB/s measured — PERF.md); with indices_are_sorted the
    # lowering streams. The (N,) key sort + one row gather is cheap.
    order = jnp.argsort(ids)
    ids_s = ids[order]
    feats_s = feats[order]
    init = jnp.full((nx * ny, c), -jnp.inf, feats.dtype)
    out = init.at[ids_s].max(feats_s, mode="drop", indices_are_sorted=True)
    out = jnp.where(jnp.isneginf(out), 0.0, out)
    return out.reshape(ny, nx, c)


def scatter_sum_bev(feats, ids, grid_size):
    """Per-sample scatter-add into the dense grid -> (H, W, C)."""
    nx, ny = grid_size
    c = feats.shape[-1]
    order = jnp.argsort(ids)  # sorted indices stream on TPU (see scatter_max_bev)
    out = jnp.zeros((nx * ny, c), feats.dtype).at[ids[order]].add(
        feats[order], mode="drop", indices_are_sorted=True
    )
    return out.reshape(ny, nx, c)


def pillar_count(ids, grid_size, dtype=jnp.float32):
    """Points-per-pillar -> (H, W)."""
    nx, ny = grid_size
    ones = jnp.ones(ids.shape + (1,), dtype)
    return scatter_sum_bev(ones, ids, grid_size)[..., 0]


def gather_from_bev(bev, ids):
    """Per-point gather back from the dense grid (the `x_max[unq_inv]` /
    `points_mean[unq_inv]` pattern, dynamic_pillar_vfe.py:226-227, :45).

    bev: (H, W, C); ids: (N,) with sentinel = H*W -> gathers 0 for invalid
    (fill-mode gather, no sentinel row materialized).
    """
    h, w, c = bev.shape
    return bev.reshape(h * w, c).at[ids].get(mode="fill", fill_value=0)


def pillar_mean_per_point(points_xyz, ids, grid_size):
    """Mean xyz of each point's pillar, gathered back per point
    (scatter_mean + gather, dynamic_pillar_vfe.py:226-227)."""
    sums = scatter_sum_bev(points_xyz, ids, grid_size)
    cnt = pillar_count(ids, grid_size, points_xyz.dtype)
    mean_bev = sums / jnp.clip(cnt, 1.0)[..., None]
    return gather_from_bev(mean_bev, ids)
