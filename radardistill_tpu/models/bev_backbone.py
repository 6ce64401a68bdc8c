"""Dense BEV neck — BaseBEVBackboneV2 equivalent.

Reference (pcdet/models/backbones_2d/base_bev_backbone.py:205-308): a 2-level
neck over (x_conv4 @8x, x_conv5 @16x):

    x8  = blocks[1](x_conv5) -> deblocks[0] (deconv k2 s2, 256ch) = 'spatial_features_2d_8x'
    out = blocks[0](concat[x_conv4, x8])  (first conv eats 512ch)  = 'spatial_features_2d'

Quirks kept: ``self.deblocks = self.deblocks[1:]`` (:282) means the level-0
deblock is built then discarded — we simply never build it; block idx 0's
first conv takes ``num_filters[0]*2`` input channels (:222-231). Each block is
[pad1 conv3 s=stride] + LAYER_NUMS x [conv3 p1] with BN(1e-3, 0.01)+ReLU.
The deconv doubles NUM_UPSAMPLE_FILTERS (:252-260) giving 256 out channels.
"""

from __future__ import annotations

from typing import Any, Sequence

import jax.numpy as jnp
from flax import linen as nn

from .layers import (
    BN_EPS_BACKBONE,
    BN_MOM_BACKBONE,
    BatchNormTorch,
    Conv2dTorch,
    ConvTranspose2dTorch,
)


class ConvStack(nn.Module):
    """[conv3(stride) + BN + ReLU] + n x [conv3 p1 + BN + ReLU]."""

    features: int
    layer_num: int
    stride: int = 1
    dtype: Any = None

    @nn.compact
    def __call__(self, x, train):
        x = Conv2dTorch(self.features, 3, self.stride, 1, use_bias=False, dtype=self.dtype, name="conv_in")(x)
        x = BatchNormTorch(BN_EPS_BACKBONE, BN_MOM_BACKBONE, dtype=self.dtype, name="bn_in")(x, train)
        x = nn.relu(x)
        for k in range(self.layer_num):
            x = Conv2dTorch(self.features, 3, 1, 1, use_bias=False, dtype=self.dtype, name=f"conv_{k}")(x)
            x = BatchNormTorch(BN_EPS_BACKBONE, BN_MOM_BACKBONE, dtype=self.dtype, name=f"bn_{k}")(x, train)
            x = nn.relu(x)
        return x


class BaseBEVBackbone(nn.Module):
    """Classic multi-level BEV FPN over a single `spatial_features` map
    (base_bev_backbone.py:6-111): per level [strided ConvStack] + deconv back
    to a common stride, concat (+ optional extra final deconv). Returns
    (spatial_features_2d, dict of per-stride intermediates)."""

    layer_nums: Sequence[int]
    layer_strides: Sequence[int]
    num_filters: Sequence[int]
    upsample_strides: Sequence[int] = ()
    num_upsample_filters: Sequence[int] = ()
    dtype: Any = None

    @nn.compact
    def __call__(self, spatial_features, train: bool):
        ups, ret = [], {}
        x = spatial_features
        h0 = spatial_features.shape[1]
        for i in range(len(self.layer_nums)):
            x = ConvStack(
                self.num_filters[i], self.layer_nums[i], stride=self.layer_strides[i],
                dtype=self.dtype, name=f"block{i}",
            )(x, train)
            ret[f"spatial_features_{h0 // x.shape[1]}x"] = x
            if len(self.upsample_strides) > i:
                s = self.upsample_strides[i]
                if s > 1:
                    y = ConvTranspose2dTorch(
                        self.num_upsample_filters[i], s, s, 0, use_bias=False,
                        dtype=self.dtype, name=f"deblock{i}_deconv",
                    )(x)
                else:  # stride 1 (or fractional -> strided conv)
                    k = max(int(round(1 / s)), 1)
                    y = Conv2dTorch(
                        self.num_upsample_filters[i], k, k, 0, use_bias=False,
                        dtype=self.dtype, name=f"deblock{i}_conv",
                    )(x) if s < 1 else ConvTranspose2dTorch(
                        self.num_upsample_filters[i], 1, 1, 0, use_bias=False,
                        dtype=self.dtype, name=f"deblock{i}_deconv",
                    )(x)
                y = BatchNormTorch(BN_EPS_BACKBONE, BN_MOM_BACKBONE, dtype=self.dtype, name=f"deblock{i}_bn")(y, train)
                ups.append(nn.relu(y))
            else:
                ups.append(x)
        x = jnp.concatenate(ups, axis=-1) if len(ups) > 1 else ups[0]
        if len(self.upsample_strides) > len(self.layer_nums):
            s = self.upsample_strides[-1]
            x = ConvTranspose2dTorch(x.shape[-1], s, s, 0, use_bias=False, dtype=self.dtype, name="deblock_final")(x)
            x = BatchNormTorch(BN_EPS_BACKBONE, BN_MOM_BACKBONE, dtype=self.dtype, name="deblock_final_bn")(x, train)
            x = nn.relu(x)
        return x, ret


class BaseBEVBackboneV1(nn.Module):
    """Two-level neck over (x_conv4, x_conv5), each block deconved and
    concatenated (base_bev_backbone.py:114-203)."""

    layer_nums: Sequence[int] = (5, 5)
    num_filters: Sequence[int] = (256, 256)
    upsample_strides: Sequence[int] = (1, 2)
    num_upsample_filters: Sequence[int] = (128, 128)
    dtype: Any = None

    @nn.compact
    def __call__(self, x_conv4, x_conv5, train: bool):
        ups = []
        for i, x in enumerate((x_conv4, x_conv5)):
            x = ConvStack(self.num_filters[i], self.layer_nums[i], stride=1,
                          dtype=self.dtype, name=f"block{i}")(x, train)
            s = self.upsample_strides[i]
            y = ConvTranspose2dTorch(
                self.num_upsample_filters[i], max(s, 1), max(s, 1), 0,
                use_bias=False, dtype=self.dtype, name=f"deblock{i}_deconv",
            )(x)
            y = BatchNormTorch(BN_EPS_BACKBONE, BN_MOM_BACKBONE, dtype=self.dtype, name=f"deblock{i}_bn")(y, train)
            ups.append(nn.relu(y))
        return jnp.concatenate(ups, axis=-1), ups[1]


class BaseBEVBackboneV2(nn.Module):
    """Two-level BEV neck. Returns (spatial_features_2d, spatial_features_2d_8x)."""

    layer_nums: Sequence[int] = (5, 5)
    layer_strides: Sequence[int] = (1, 2)
    num_filters: Sequence[int] = (256, 256)
    upsample_strides: Sequence[int] = (1, 2)
    num_upsample_filters: Sequence[int] = (128, 128)
    dtype: Any = None

    @nn.compact
    def __call__(self, x_conv4, x_conv5, train: bool):
        # level-1 path on x_conv5 then upsample back to 8x
        x = ConvStack(
            self.num_filters[1], self.layer_nums[1], stride=1, dtype=self.dtype, name="block1"
        )(x_conv5, train)
        # deblock idx 1 (the only surviving one): deconv k=s=2, out = 2*num_upsample_filters[1]
        up_ch = self.num_upsample_filters[1] * 2
        s = self.upsample_strides[1]
        x = ConvTranspose2dTorch(up_ch, s, s, 0, use_bias=False, dtype=self.dtype, name="deblock1_deconv")(x)
        x = BatchNormTorch(BN_EPS_BACKBONE, BN_MOM_BACKBONE, dtype=self.dtype, name="deblock1_bn")(x, train)
        x8 = nn.relu(x)

        x = jnp.concatenate([x_conv4, x8], axis=-1)
        out = ConvStack(
            self.num_filters[0], self.layer_nums[0], stride=1, dtype=self.dtype, name="block0"
        )(x, train)
        return out, x8
