"""Dynamic pillar VFE, static-shape TPU formulation.

Reference behavior (pcdet/models/backbones_3d/vfe/dynamic_pillar_vfe.py):
- DynamicPillarVFESimple2D (:146-252): per-point features
  ``[f_center, raw(abs xyz + extra feats), f_cluster, f_relative]``, one
  PFNLayerV2 (Linear→BN1d→ReLU→scatter_max per pillar) producing 32-ch pillar
  features + sparse pillar coords.
- Radar_DynamicPillarVFESimple2D (:255-313): same, reads ``radar_points``.
- Radar_DynamicPillarVFESimple2D_Test (:315-373): reads ``points`` (radar-only
  eval) but writes the radar keys.

TPU re-design: points come in padded ``(B, N, 1+F)`` (feature 0 is unused
here; the batch index column of the reference's ragged layout is replaced by
the batch dim) with a validity mask. Pillar reduction goes straight into the
dense BEV grid (ops/voxelize.py) — output is the dense ``(B, H, W, C)``
feature map + occupancy mask, which is exactly what the masked-dense sparse
backbone consumes. No unique/dedup, no sparse coords.
"""

from __future__ import annotations

from typing import Sequence, Tuple

import jax
import jax.numpy as jnp
from flax import linen as nn

from ..ops import voxelize
from .layers import MaskedBatchNorm


class PFNLayerV2(nn.Module):
    """Linear→(masked)BN1d→ReLU→per-pillar max (dynamic_pillar_vfe.py:14-46).

    Non-last layers halve out_channels and concat [x, max_gathered_back].
    """

    out_channels: int
    use_norm: bool = True
    last_layer: bool = False
    dtype: object = None  # compute dtype for the SCATTER GRID (the byte hog
                          # — (B, H·W, C)); point features/Linear/BN stay f32
                          # for coordinate precision, activations are cast
                          # post-BN (they are normalized, O(1))

    @nn.compact
    def __call__(self, feats, ids, point_mask, grid_size, train: bool):
        out_ch = self.out_channels if self.last_layer else self.out_channels // 2
        x = nn.Dense(out_ch, use_bias=not self.use_norm, name="linear")(feats)
        if self.use_norm:
            x = MaskedBatchNorm(name="norm")(x, point_mask, train)
        x = nn.relu(x)
        x = jnp.where(point_mask[..., None], x, 0.0)
        if self.dtype is not None:
            x = x.astype(self.dtype)
        # per-pillar max on the dense grid (torch_scatter.scatter_max equiv.)
        bev = jax.vmap(lambda f, i: voxelize.scatter_max_bev(f, i, grid_size))(x, ids)
        if self.last_layer:
            return x, bev
        x_max_back = jax.vmap(voxelize.gather_from_bev)(bev, ids)
        return jnp.concatenate([x, x_max_back], axis=-1), None


class DynamicPillarVFESimple2D(nn.Module):
    """Pillar encoder producing a dense BEV grid.

    Attributes mirror the reference config keys (VFE block of
    radar_distill_train.yaml:70-84).
    """

    num_filters: Sequence[int]
    voxel_size: Sequence[float]
    point_cloud_range: Sequence[float]
    grid_size: Tuple[int, int]  # (nx, ny)
    use_norm: bool = True
    with_distance: bool = False
    use_absolute_xyz: bool = True
    use_cluster_xyz: bool = True
    use_relative_xyz: bool = True
    dtype: object = None  # scatter-grid dtype (see PFNLayerV2); raw point
                          # coordinates are consumed in their input precision
    packed_order: bool = False  # sort the pillar table by the space-to-depth
                          # PACKED key (voxelize.packed_key; id VALUES stay
                          # linear) so the S2D entry densify needs no index
                          # transpose. Per-pillar math is order-invariant;
                          # only the table ROW ORDER (and, on overflow,
                          # which pillars are dropped) changes.

    def _f_center(self, points, ids):
        vx, vy, vz = self.voxel_size[:3]
        x_off = vx / 2 + self.point_cloud_range[0]
        y_off = vy / 2 + self.point_cloud_range[1]
        z_off = vz / 2 + self.point_cloud_range[2]
        xyz = points[..., 0:3]
        nx = self.grid_size[0]
        cx = ids % nx  # invalid ids -> sentinel row; masked later
        cy = ids // nx
        return jnp.stack(
            [
                xyz[..., 0] - (cx.astype(xyz.dtype) * vx + x_off),
                xyz[..., 1] - (cy.astype(xyz.dtype) * vy + y_off),
                xyz[..., 2] - z_off,
            ],
            axis=-1,
        )

    def _assemble_features(self, points, valid, ids, mean):
        """Per-point feature vector given the (already reduced) cluster mean.

        Order (dynamic_pillar_vfe.py:214-237): f_center,
        absolute(x,y,z,extras) | extras, f_cluster, f_relative.
        """
        xyz = points[..., 0:3]
        feats = [self._f_center(points, ids)]
        if self.use_absolute_xyz:
            feats.append(points)
        else:
            feats.append(points[..., 3:])
        if self.use_cluster_xyz:
            feats.append(xyz - mean)
        if self.with_distance:
            feats.append(jnp.linalg.norm(xyz, axis=-1, keepdims=True))
        if self.use_relative_xyz:
            pc0 = jnp.asarray(self.point_cloud_range[:3], xyz.dtype)
            feats.append(xyz - pc0)
        out = jnp.concatenate(feats, axis=-1)
        return jnp.where(valid[..., None], out, 0.0)

    def build_point_features(self, points, valid, ids):
        """Legacy dense-grid formulation (kept for parity tests)."""
        xyz = points[..., 0:3]
        mean = jax.vmap(
            lambda p, i: voxelize.pillar_mean_per_point(p, i, self.grid_size)
        )(xyz, ids) if self.use_cluster_xyz else None
        return self._assemble_features(points, valid, ids, mean)

    def _slot_mean(self, xyz, valid, slot, capacity):
        """Cluster mean per point — segmented scans, no table round-trip.

        The previous table formulation (width-4 scatter + gather-back over
        640k point rows) paid the TPU per-row cost twice: ~26 ms/step at
        bs4 (r2 profile, f32[640004,4]). Points arrive SORTED by pillar id
        (slot monotone), so the segment total at every point is
        forward-inclusive + backward-exclusive segmented sums — two
        associative scans of elementwise log-depth passes, zero row ops.
        Sentinel points (slot == capacity) form a trailing junk segment;
        their means are masked by _assemble_features' where(valid)."""
        del capacity  # segment structure comes from slot boundaries alone
        xyz1 = jnp.concatenate(
            [jnp.where(valid[..., None], xyz, 0.0),
             valid[..., None].astype(xyz.dtype)], axis=-1,
        )  # (B, N, 4)
        prev = jnp.concatenate([slot[:, :1] - 1, slot[:, :-1]], axis=1)
        starts = (slot != prev).astype(xyz.dtype)[..., None]  # (B, N, 1)

        def seg_sum(flags, vals):
            def combine(a, b):
                af, av = a
                bf, bv = b
                return jnp.maximum(af, bf), bv + av * (1.0 - bf)

            _, out = jax.lax.associative_scan(combine, (flags, vals), axis=1)
            return out

        fwd = seg_sum(starts, xyz1)  # inclusive prefix within segment
        nxt = jnp.concatenate([slot[:, 1:], slot[:, -1:] + 1], axis=1)
        ends = (slot != nxt).astype(xyz.dtype)[..., None]
        bwd = seg_sum(ends[:, ::-1], xyz1[:, ::-1])[:, ::-1]  # incl. suffix
        total = fwd + bwd - xyz1
        return total[..., :3] / jnp.clip(total[..., 3:], 1.0)

    def encode_table(self, points, point_mask, train: bool, capacity: int,
                     pre=None):
        """Shared compact-table encoder: sort points by pillar id once,
        reduce through the PFN into a (B, capacity, C) sorted pillar table.

        Returns (table, uids, count). Every scatter/gather is monotone; the
        dense (B, H*W, C) scatter grids of the original formulation never
        exist (their row scatters ran at ~2 GB/s on TPU with XLA picking a
        dim0-minor layout — PERF.md r2 profile: 80 ms/step at bs4).

        ``pre`` (optional): host-precomputed dict(ids, slot, uids, count)
        from data/host_precompute.pillar_encode — points then arrive ALREADY
        sorted by pillar id and the device skips the argsort/take (8.6 ms/
        step, PERF.md r3d) and the compact-unique. Bit-identical (the host
        sort is the same stable sort; tests/test_host_precompute.py)."""
        from ..ops import active_site as asx

        nx, ny = self.grid_size
        sent = nx * ny
        if pre is not None:
            slot = pre["slot"]
            uids, count = pre["uids"], pre["count"]
            if "ids" in pre:
                ids = pre["ids"]
            else:
                # loader dropped per-point ids (transfer bytes): reconstruct
                # EXACTLY via one flat gather — overflow is impossible here
                # (HostPrecompute._drop_ids gates on capacity >= n_points),
                # so every valid point's slot addresses its own pillar row
                # and invalid points hit the junk row (uid = sentinel)
                b, cap = uids.shape
                uids_z = jnp.concatenate(
                    [uids, jnp.full((b, 1), sent, uids.dtype)], axis=1)
                flat = slot + jnp.arange(b, dtype=slot.dtype)[:, None] * (cap + 1)
                ids = uids_z.reshape(-1)[flat]
            valid = ids < sent
        else:
            coords, in_range = voxelize.compute_pillar_coords(
                points[..., :2], self.point_cloud_range, self.voxel_size, self.grid_size
            )
            valid = point_mask & in_range
            ids = voxelize.pillar_ids(coords, valid, self.grid_size)

            key = (voxelize.packed_key(ids, self.grid_size)
                   if self.packed_order else ids)
            order = jnp.argsort(key, axis=-1)
            ids = jnp.take_along_axis(ids, order, axis=-1)
            points = jnp.take_along_axis(points, order[..., None], axis=1)
            valid = jnp.take_along_axis(valid, order, axis=-1)

            uids, slot, count = jax.vmap(
                lambda i: asx.compact_unique_sorted(i, capacity, sent)
            )(ids)

        if not self.use_cluster_xyz:
            mean = None
        elif pre is not None and "mean" in pre:
            # host-computed cluster mean (csrc pillar_sort_encode — a pure
            # function of the raw points, no gradient path; equal to
            # _slot_mean at f32 resolution, saving its two associative
            # scans: ~5.5 ms/step, PERF.md r3d).
            # CAVEAT (advisor r4): the equality holds only for points in
            # non-overflowed pillars. Overflow points (slot==capacity) get a
            # TRUE per-pillar mean here but a merged junk-segment mean from
            # the device fallback, and those points feed MaskedBatchNorm
            # statistics before the junk row is dropped — so train and eval
            # must BOTH use HostPrecompute (or neither) when use_cluster_xyz
            # is on, unless as_overflow==0 for the config's capacities (the
            # shipped caps are data-derived to make overflow rare; monitor
            # the tb 'overflow/*' counters).
            mean = pre["mean"].astype(points.dtype)
        else:
            mean = self._slot_mean(points[..., 0:3], valid, slot, capacity)
        feats = self._assemble_features(points, valid, ids, mean)

        table = None
        n_layers = len(self.num_filters)
        for i, out_ch in enumerate(self.num_filters):
            feats, table = PFNLayerV2Sparse(
                out_channels=out_ch,
                capacity=capacity,
                use_norm=self.use_norm,
                last_layer=(i >= n_layers - 1),
                dtype=self.dtype,
                name=f"pfn_{i}",
            )(feats, slot, valid, train)
        return table, uids, count

    @nn.compact
    def __call__(self, points, point_mask, train: bool):
        """points: (B, N, F) [x,y,z,...]; point_mask: (B, N) bool.

        Returns (bev_features (B, H, W, C), pillar_mask (B, H, W) bool).
        Internally reduces into a compact pillar table (capacity = N points,
        so overflow is impossible) and expands to the dense grid with ONE
        gather-based densify per sample.
        """
        from ..ops import active_site as asx

        table, uids, _ = self.encode_table(
            points, point_mask, train, capacity=points.shape[1]
        )
        nx, ny = self.grid_size
        bev, pillar_mask = asx.densify_batch(table, uids, (ny, nx))
        return bev, pillar_mask

    @property
    def output_dim(self):
        return self.num_filters[-1]


class PFNLayerV2Sparse(nn.Module):
    """PFNLayerV2 reducing into a fixed-capacity pillar TABLE instead of the
    dense grid. Identical params/names ("linear", "norm") — checkpoints are
    interchangeable with PFNLayerV2."""

    out_channels: int
    capacity: int
    use_norm: bool = True
    last_layer: bool = False
    dtype: object = None

    @nn.compact
    def __call__(self, feats, slot, point_mask, train: bool):
        """feats: (B, N, F) points SORTED by pillar id; slot: (B, N) row in
        the pillar table (capacity = invalid/overflow, monotone per sample)."""
        out_ch = self.out_channels if self.last_layer else self.out_channels // 2
        x = nn.Dense(out_ch, use_bias=not self.use_norm, name="linear")(feats)
        if self.use_norm:
            x = MaskedBatchNorm(name="norm")(x, point_mask, train)
        x = nn.relu(x)
        x = jnp.where(point_mask[..., None], x, 0.0)
        if self.dtype is not None:
            x = x.astype(self.dtype)

        # flat-batched segment max (vmapped batched scatters take
        # batch-interleaved layouts — see ops/active_site._densify_rows_b);
        # per-sample junk row `capacity` absorbs sentinel slots
        b, n_pts, ch_out = x.shape
        cap1 = self.capacity + 1
        flat = (
            slot + jnp.arange(b, dtype=slot.dtype)[:, None] * cap1
        ).reshape(-1)
        t = jnp.full((b * cap1, ch_out), -jnp.inf, x.dtype).at[flat].max(
            x.reshape(-1, ch_out), mode="drop", indices_are_sorted=True
        )
        t = jnp.where(jnp.isneginf(t), 0.0, t)
        table = t.reshape(b, cap1, ch_out)[:, : self.capacity]
        if self.last_layer:
            return x, table
        back = t.at[flat].get(mode="clip", indices_are_sorted=True).reshape(
            b, n_pts, ch_out
        )
        # sentinel slots read the junk row; zero them (fill-mode semantics)
        back = jnp.where((slot < self.capacity)[..., None], back, 0.0)
        return jnp.concatenate([x, back], axis=-1), None


class DynamicPillarVFESparse(DynamicPillarVFESimple2D):
    """DynamicPillarVFESimple2D emitting a sorted active-site pillar table
    (feats (B, cap, C), uids (B, cap), count (B,)) instead of the dense BEV
    grid — the front-end of the active-site backbone. This is the closest
    TPU analog of the reference's actual dataflow (torch.unique + scatter to
    a packed pillar list, dynamic_pillar_vfe.py:195-252): the dense grid is
    never materialized, which also removes the (B, H*W, C) scatter buffers
    that dominated the VFE's footprint (PERF.md).

    Params are identical to the dense VFE (same pfn_i/linear|norm scopes).
    """

    capacity: int = 65536

    @nn.compact
    def __call__(self, points, point_mask, train: bool, pre=None):
        return self.encode_table(points, point_mask, train, self.capacity, pre)


class MeanVFE(nn.Module):
    """Mean-pool VFE (vfe/mean_vfe.py MeanVFE / RADAR_MeanVFE): per-pillar
    mean of raw point features, no learned layers."""

    voxel_size: Sequence[float]
    point_cloud_range: Sequence[float]
    grid_size: Tuple[int, int]

    @nn.compact
    def __call__(self, points, point_mask, train: bool):
        coords, in_range = voxelize.compute_pillar_coords(
            points[..., :2], self.point_cloud_range, self.voxel_size, self.grid_size
        )
        valid = point_mask & in_range
        ids = voxelize.pillar_ids(coords, valid, self.grid_size)
        feats = jnp.where(valid[..., None], points, 0.0)
        sums = jax.vmap(lambda f, i: voxelize.scatter_sum_bev(f, i, self.grid_size))(feats, ids)
        cnt = jax.vmap(lambda i: voxelize.pillar_count(i, self.grid_size))(ids)
        bev = sums / jnp.clip(cnt, 1.0)[..., None]
        return bev, cnt > 0


class DynamicPillarVFE(DynamicPillarVFESimple2D):
    """Original DynamicPillarVFE feature layout
    (dynamic_pillar_vfe.py:49-142): [raw(abs)|extras, f_cluster, f_center]
    (no f_relative), with multi-layer PFN supported by the shared PFNLayerV2."""

    use_relative_xyz: bool = False

    def _assemble_features(self, points, valid, ids, mean):
        xyz = points[..., 0:3]
        feats = [
            points if self.use_absolute_xyz else points[..., 3:],
            xyz - mean,
            self._f_center(points, ids),
        ]
        if self.with_distance:
            feats.append(jnp.linalg.norm(xyz, axis=-1, keepdims=True))
        out = jnp.concatenate(feats, axis=-1)
        return jnp.where(valid[..., None], out, 0.0)


class PillarVFE(nn.Module):
    """Fixed-size pillar VFE (vfe/pillar_vfe.py PillarVFE): consumes the
    `transform_points_to_voxels` output — voxels (B, V, P, F) with
    voxel_num_points and (z, y, x) coords — augments per-point features with
    cluster-mean and center offsets, runs PFN layers with a max over the P
    points, and scatters pillar features to the dense grid.

    The RadarDistill path uses the dynamic VFE instead; this exists for the
    fixed-pillar model family (PointPillars-style configs)."""

    num_filters: Sequence[int]
    voxel_size: Sequence[float]
    point_cloud_range: Sequence[float]
    grid_size: Tuple[int, int]
    use_norm: bool = True
    with_distance: bool = False
    use_absolute_xyz: bool = True

    @nn.compact
    def __call__(self, voxels, voxel_num_points, voxel_coords, train: bool):
        """voxels: (B, V, P, F); voxel_num_points: (B, V);
        voxel_coords: (B, V, 3) int (z, y, x), -1 rows = padding.
        Returns (bev (B, H, W, C), pillar_mask)."""
        b, v, p, f = voxels.shape
        vx, vy, vz = self.voxel_size[:3]
        x0, y0, z0 = self.point_cloud_range[:3]

        pt_idx = jnp.arange(p)[None, None, :]
        pmask = pt_idx < voxel_num_points[..., None]  # (B, V, P)
        vmask = voxel_coords[..., 0] >= 0  # (B, V)
        pmask = pmask & vmask[..., None]

        xyz = voxels[..., :3]
        n = jnp.clip(voxel_num_points[..., None, None].astype(jnp.float32), 1.0)
        mean = jnp.sum(xyz * pmask[..., None], axis=2, keepdims=True) / n
        f_cluster = xyz - mean

        cx = (voxel_coords[..., 2:3].astype(jnp.float32) * vx + vx / 2 + x0)[..., None, :]
        cy = (voxel_coords[..., 1:2].astype(jnp.float32) * vy + vy / 2 + y0)[..., None, :]
        cz = (voxel_coords[..., 0:1].astype(jnp.float32) * vz + vz / 2 + z0)[..., None, :]
        f_center = jnp.concatenate(
            [xyz[..., 0:1] - cx, xyz[..., 1:2] - cy, xyz[..., 2:3] - cz], axis=-1
        )

        feats = [voxels if self.use_absolute_xyz else voxels[..., 3:], f_cluster, f_center]
        if self.with_distance:
            feats.append(jnp.linalg.norm(xyz, axis=-1, keepdims=True))
        x = jnp.concatenate(feats, axis=-1)
        x = jnp.where(pmask[..., None], x, 0.0)

        n_layers = len(self.num_filters)
        for i, out_ch in enumerate(self.num_filters):
            last = i >= n_layers - 1
            ch = out_ch if last else out_ch // 2
            y = nn.Dense(ch, use_bias=not self.use_norm, name=f"pfn_{i}_linear")(x)
            if self.use_norm:
                y = MaskedBatchNorm(name=f"pfn_{i}_norm")(y, pmask, train)
            y = nn.relu(y)
            y = jnp.where(pmask[..., None], y, -jnp.inf)
            y_max = jnp.max(y, axis=2, keepdims=True)  # (B, V, 1, C)
            y_max = jnp.where(jnp.isneginf(y_max), 0.0, y_max)
            if last:
                pillar_feats = y_max[:, :, 0]  # (B, V, C)
            else:
                x = jnp.concatenate(
                    [jnp.where(pmask[..., None], y, 0.0),
                     jnp.broadcast_to(y_max, y.shape)], axis=-1
                )

        # scatter pillars to the dense grid (PointPillarScatter)
        nx, ny = self.grid_size
        ids = voxel_coords[..., 1] * nx + voxel_coords[..., 2]
        ids = jnp.where(vmask, ids, nx * ny)
        bev = jax.vmap(lambda ft, i: voxelize.scatter_max_bev(ft, i, self.grid_size))(
            jnp.where(vmask[..., None], pillar_feats, -jnp.inf), ids
        )
        cnt = jax.vmap(lambda i: voxelize.pillar_count(i, self.grid_size))(ids)
        return bev, cnt > 0


def vfe_input_dim(num_raw_features: int, cfg) -> int:
    """Channel count fed to the first PFN linear, matching
    dynamic_pillar_vfe.py:150-163."""
    n = 3  # f_center
    n += num_raw_features if cfg.get("USE_ABSLOTE_XYZ", True) else num_raw_features - 3
    if cfg.get("USE_CLUSTER_XYZ", True):
        n += 3
    if cfg.get("WITH_DISTANCE", False):
        n += 1
    if cfg.get("USE_RELATIVE_XYZ", True):
        n += 3
    return n
