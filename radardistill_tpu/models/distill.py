"""CMA densification hourglass + AFD/PFD distillation losses.

Reference: pcdet/models/backbones_2d/radar_distill_final.py (Radar_Distill,
:29-218) and pcdet/ops/basicblock/modules/Basicblock_convn.py (ConvNeXtBlock
/ LayerNorm / GRN, :10-95).

Architecture (CMA forward, radar_distill_final.py:177-217), all at 256 ch:

    s      = radar x_conv4 (8x, 180²)
    en16   = encoder_1(s)                          # ConvNeXt(down: DCN s2) + ConvNeXt -> 90²
    de8    = agg_1(cat[decoder_1(en16), s])        # deconv k4 s2 p1 -> 180²
    en32   = encoder_2(en16)                       # -> 45²
    de16   = agg_2(cat[decoder_2(en32), encoder_3(de8)])   # -> 90²
    out    = agg_3(cat[decoder_3(de16), de8])      # -> 180² ('radar_spatial_features_8x_2')

The inherited BaseBEVBackboneV2 neck then runs on (out, x_conv5) producing
'radar_spatial_features_2d{,_8x}' — that composition happens in the detector.

Losses (pure functions; reductions follow the reference exactly):
  - AFD (`low_loss`, :82-109): activation-masked MSE between the densified
    radar BEV and the teacher x_conv4 + an L1 "occupancy" loss.
  - PFD (`high_loss`, :111-141): TP/FN/FP-weighted L1 between channel-
    softmaxed teacher/student neck features at both scales.
  - `distill_loss` (get_loss, :144-175): 5·low + 25·high.

All feature maps here are NHWC.
"""

from __future__ import annotations

from typing import Any

import jax
import jax.numpy as jnp
from flax import linen as nn

from ..ops.dcn import modulated_deform_conv
from .layers import (
    BatchNormTorch,
    Conv2dTorch,
    ConvTranspose2dTorch,
    GRN,
    LayerNormTorch,
    clip_sigmoid,
    conv_kernel_init_torch,
)


def gelu(x):
    # torch nn.GELU default is the exact erf form
    return jax.nn.gelu(x, approximate=False)


class ConvNeXtBlock(nn.Module):
    """ConvNeXt-v2 block, optionally prefixed by a stride-2 DCNv2 downsample
    (Basicblock_convn.py:10-56)."""

    dim: int
    downsample: bool = False
    dtype: Any = None

    @nn.compact
    def __call__(self, x, train: bool):
        if self.downsample:
            # offset/mask head: conv3 s2 p1 bias=True -> 27 ch = 9*(2+1)
            om = Conv2dTorch(27, 3, 2, 1, use_bias=True, dtype=self.dtype, name="conv_offset_mask1")(x)
            o1, o2, m = jnp.split(om, 3, axis=-1)
            # cat(o1, o2) then read interleaved as [Δy_k, Δx_k] — the same
            # (learned) channel mixing the CUDA kernel applies to the
            # reference's cat-ed offsets (modulated_deform_im2col_cuda.cuh)
            offset = jnp.concatenate([o1, o2], axis=-1)
            # offset-saturation telemetry (VERDICT r3 #5): the TPU kernels
            # clamp offsets to ±DCN_MAX_OFFSET cells while the reference's
            # CUDA offsets are unbounded — log the fraction that saturates
            # so a clamp-hungry CMA is visible (tb `dcn_offset_sat` via the
            # train step's mutable 'diagnostics' collection; a no-op in
            # eval/apply without that collection)
            from ..ops.dcn import dcn_max_offset

            self.sow(
                "diagnostics", "dcn_offset_sat",
                jnp.mean(
                    (jnp.abs(offset.astype(jnp.float32)) > dcn_max_offset()
                     ).astype(jnp.float32)),
            )
            m = jax.nn.sigmoid(m)
            w = self.param("down_weight", conv_kernel_init_torch, (3, 3, self.dim, self.dim))
            # the reference's ModulatedDeformConv(bias=False) still CREATES
            # and kaiming-inits a bias, freezing it via requires_grad=False
            # (modulated_deform_conv.py:38-41, :47-49) — a fixed additive
            # bias that ships in its checkpoints. Carried here as a
            # stop_gradient'ed param (never trained, matching the reference;
            # excluded from AdamW decay via optim.freeze_mask) so converted
            # checkpoints reproduce the reference forward exactly.
            b = self.param("down_bias", nn.initializers.zeros, (self.dim,))
            x = modulated_deform_conv(x, offset, m, w, stride=2, padding=1)
            x = x + jax.lax.stop_gradient(b).astype(x.dtype)

        identity = x
        x = Conv2dTorch(self.dim, 7, 1, 3, use_bias=True, groups=self.dim, dtype=self.dtype, name="dwconv")(x)
        x = LayerNormTorch(name="norm")(x)
        x = nn.Dense(4 * self.dim, name="pwconv1")(x)
        x = gelu(x)
        x = GRN(name="grn")(x)
        x = nn.Dense(self.dim, name="pwconv2")(x)
        return x + identity


class DecoderBlock(nn.Module):
    """ConvTranspose2d(4,2,1) + BN + GELU (radar_distill_final.py:38-42)."""

    dim: int = 256
    dtype: Any = None

    @nn.compact
    def __call__(self, x, train):
        x = ConvTranspose2dTorch(self.dim, 4, 2, 1, use_bias=True, dtype=self.dtype, name="deconv")(x)
        x = BatchNormTorch(dtype=self.dtype, name="bn")(x, train)
        return gelu(x)


class AggBlock(nn.Module):
    """1x1 Conv(512->256) + BN + GELU (radar_distill_final.py:43-47)."""

    dim: int = 256
    dtype: Any = None

    @nn.compact
    def __call__(self, x, train):
        x = Conv2dTorch(self.dim, 1, 1, 0, use_bias=True, dtype=self.dtype, name="conv")(x)
        x = BatchNormTorch(dtype=self.dtype, name="bn")(x, train)
        return gelu(x)


class CMAHourglass(nn.Module):
    """The 3-stage densification hourglass (radar_distill_final.py:177-201).

    Returns (radar_spatial_features_8x_2, radar_spatial_features_8x_1)."""

    dim: int = 256
    dtype: Any = None

    @nn.compact
    def __call__(self, spatial_features, train: bool):
        enc1a = ConvNeXtBlock(self.dim, downsample=True, dtype=self.dtype, name="encoder_1_0")
        enc1b = ConvNeXtBlock(self.dim, downsample=False, dtype=self.dtype, name="encoder_1_1")
        enc2a = ConvNeXtBlock(self.dim, downsample=True, dtype=self.dtype, name="encoder_2_0")
        enc2b = ConvNeXtBlock(self.dim, downsample=False, dtype=self.dtype, name="encoder_2_1")
        enc3a = ConvNeXtBlock(self.dim, downsample=True, dtype=self.dtype, name="encoder_3_0")
        enc3b = ConvNeXtBlock(self.dim, downsample=False, dtype=self.dtype, name="encoder_3_1")

        en_16x = enc1b(enc1a(spatial_features, train), train)
        de_8x = jnp.concatenate(
            [DecoderBlock(self.dim, self.dtype, name="decoder_1")(en_16x, train), spatial_features],
            axis=-1,
        )
        de_8x = AggBlock(self.dim, self.dtype, name="agg_1")(de_8x, train)

        en_32x = enc2b(enc2a(en_16x, train), train)
        de_16x = jnp.concatenate(
            [
                DecoderBlock(self.dim, self.dtype, name="decoder_2")(en_32x, train),
                enc3b(enc3a(de_8x, train), train),
            ],
            axis=-1,
        )
        de_16x = AggBlock(self.dim, self.dtype, name="agg_2")(de_16x, train)

        x = jnp.concatenate(
            [DecoderBlock(self.dim, self.dtype, name="decoder_3")(de_16x, train), de_8x],
            axis=-1,
        )
        x_conv4 = AggBlock(self.dim, self.dtype, name="agg_3")(x, train)
        return x_conv4, de_8x


# ---------------------------------------------------------------------------
# Distillation losses (pure functions over NHWC feature maps)
# ---------------------------------------------------------------------------


def afd_low_loss(lidar_bev, radar_bev):
    """Activation-based feature distillation (radar_distill_final.py:82-109).

    Returns (feature_loss, mask_loss). NHWC inputs (B, H, W, C).
    """
    B = radar_bev.shape[0]
    lidar_act = jnp.sum(lidar_bev, axis=-1, keepdims=True)
    lidar_mask = (lidar_act > 0).astype(jnp.float32)
    radar_act = jnp.sum(radar_bev, axis=-1, keepdims=True)

    activate = (radar_act > 0).astype(jnp.float32) + lidar_mask * 0.5
    m_rl = (activate == 1.5).astype(jnp.float32)  # radar ∩ lidar active
    m_rd = (activate == 1.0).astype(jnp.float32)  # radar active, lidar not
    m_rd = m_rd * (jnp.sum(m_rl) / jnp.clip(jnp.sum(m_rd), 1.0))

    sq = (radar_bev.astype(jnp.float32) - lidar_bev.astype(jnp.float32)) ** 2
    loss_rl = jnp.sum(sq * m_rl) / B
    loss_rd = jnp.sum(sq * m_rd) / B
    feature_loss = 3e-4 * loss_rl + 5e-5 * loss_rd

    mask_loss = jnp.mean(jnp.abs(jax.nn.sigmoid(radar_act.astype(jnp.float32)) - lidar_mask))
    return feature_loss, mask_loss


def pfd_high_loss(radar_bev, radar_bev_8x, lidar_bev, lidar_bev_8x, gt_heatmap_max, radar_heatmap_max):
    """Proposal-based feature distillation (radar_distill_final.py:111-141).

    gt_heatmap_max / radar_heatmap_max: (B, H, W, 1) — max over all classes of
    the GT gaussian heatmap / clip-sigmoided radar hm predictions.
    """
    thres = 0.1
    gt_thres = 0.1
    fp = (gt_heatmap_max < gt_thres) & (radar_heatmap_max > thres)
    fn = (gt_heatmap_max > gt_thres) & (radar_heatmap_max < thres)
    tp = (gt_heatmap_max > gt_thres) & (radar_heatmap_max > thres)

    tp_fn = tp | fn
    weight = (
        tp_fn.astype(jnp.float32) * (5.0 / jnp.clip(jnp.sum(tp_fn), 1.0))
        + fp.astype(jnp.float32) * (1.0 / jnp.clip(jnp.sum(fp), 1.0))
    )

    def scaled_l1(a, b):
        sa = jax.nn.softmax(a.astype(jnp.float32), axis=-1)
        sb = jax.nn.softmax(b.astype(jnp.float32), axis=-1)
        return jnp.sum(jnp.abs(sa - sb) * weight)

    high = scaled_l1(radar_bev, lidar_bev)
    high_8x = scaled_l1(radar_bev_8x, lidar_bev_8x)
    return 0.5 * (high + high_8x)


def distill_loss(outputs: dict):
    """Total distill loss 5·low + 25·high (radar_distill_final.py:144-175).

    `outputs` carries (NHWC): teacher 'x_conv4', student
    'radar_spatial_features_8x_2'/'_8x_1', both necks'
    'spatial_features_2d{,_8x}' + radar twins, GT 'heatmaps' (B,H,W,ncls
    concatenated over heads) and radar 'radar_hm_preds' (same, logits).
    """
    feat_l, mask_l = afd_low_loss(outputs["x_conv4"], outputs["radar_spatial_features_8x_2"])
    feat_l8, mask_l8 = afd_low_loss(outputs["x_conv4"], outputs["radar_spatial_features_8x_1"])

    gt_hm_max = jnp.max(outputs["heatmaps"], axis=-1, keepdims=True)
    radar_hm_max = jnp.max(clip_sigmoid(outputs["radar_hm_preds"]), axis=-1, keepdims=True)

    high = pfd_high_loss(
        outputs["radar_spatial_features_2d"],
        outputs["radar_spatial_features_2d_8x"],
        outputs["spatial_features_2d"],
        outputs["spatial_features_2d_8x"],
        gt_hm_max,
        radar_hm_max,
    ) * 25.0
    low = (0.5 * (feat_l + feat_l8) + 0.5 * (mask_l + mask_l8)) * 5.0
    total = low + high
    tb = {
        "low_feature_loss": low,
        "high_distill_loss": high,
        "distll_loss": total,
        "low_distill_de_8x_loss": feat_l8,
        "low_distill_loss": feat_l,
        "mask_loss": mask_l,
        "mask_de_8x_loss": mask_l8,
    }
    return total, tb
