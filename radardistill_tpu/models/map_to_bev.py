"""map_to_bev stage (pcdet/models/backbones_2d/map_to_bev/).

Reference components (height_compression.py:4-51 HeightCompression /
RADAR_HeightCompression; pointpillar_scatter.py PointPillarScatter):
collapse a sparse 3D tensor's z axis into BEV channels / scatter pillar
features into the dense grid.

In the TPU dense formulation these are cheap reshapes: the backbone already
produces dense tensors, and the VFE already scatters to the dense grid —
``PointPillarScatter`` exists for API parity with configs that list it
(RadarDistill's own configs do NOT use this stage; the 2D pillar backbone
emits BEV directly — SURVEY.md §2.5 map_to_bev row).
"""

from __future__ import annotations

import jax.numpy as jnp
from flax import linen as nn


class HeightCompression(nn.Module):
    """(B, H, W, D, C) dense voxel features -> (B, H, W, D*C) BEV."""

    num_bev_features: int | None = None

    @nn.compact
    def __call__(self, voxel_features_dense):
        b, h, w, d, c = voxel_features_dense.shape
        return voxel_features_dense.reshape(b, h, w, d * c)


class PointPillarScatter(nn.Module):
    """Dense passthrough: the VFE already emits (B, H, W, C) + mask, which is
    exactly what this stage produced in the reference."""

    @nn.compact
    def __call__(self, bev, pillar_mask):
        return bev * pillar_mask[..., None].astype(bev.dtype)
