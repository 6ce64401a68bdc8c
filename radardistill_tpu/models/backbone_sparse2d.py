"""PillarNet sparse 2D ResNet-18 BEV encoder — masked-dense TPU formulation.

Reference (pcdet/models/backbones_3d/spconv_backbone_2d.py:208-324
``PillarRes18BackBone8x`` + :41-77 ``SparseBasicBlock``, built on spconv
SubMConv2d / SparseConv2d):

    conv1: 2x SparseBasicBlock(32)                 stride 1   (1440²)
    conv2: SparseConv2d(32→64,s2) + 2x block(64)   stride 2   (720²)
    conv3: SparseConv2d(64→128,s2) + 2x block(128) stride 4   (360²)
    conv4: SparseConv2d(128→256,s2)+ 2x block(256) stride 8   (180²)
    .dense() → conv5: dense Conv(256,s2)+BN+ReLU + 2x dense BasicBlock  (90²)

TPU re-design — exact sparse semantics on dense tensors:
- submanifold conv == dense conv x occupancy mask (inactive inputs are 0, and
  output sites == input sites), so ``y = relu(bn(conv(x))) * mask``;
- strided SparseConv2d grows the active set to every output site whose 3x3
  receptive field touches an active input — ``mask' = maxpool(mask, 3, s2)``;
- BN statistics are computed over active sites only (MaskedBatchNorm), which
  is what spconv's BatchNorm1d over the packed feature list does;
- ``.dense()`` is the identity here (we are already dense), so conv5 runs
  plain dense convs with ordinary (unmasked) BN, matching the reference.

All convs are MXU-shaped NHWC; the whole stack is jit/remat friendly. The
radar twin (spconv_backbone_2d_distillation.py:6-96) is the same module
applied to the radar BEV stream — twinning happens at the detector level via
separate parameter scopes, not duplicated code.
"""

from __future__ import annotations

from typing import Any, Dict

import jax
import jax.numpy as jnp
from flax import linen as nn

from .layers import (
    BN_EPS_BACKBONE,
    BN_MOM_BACKBONE,
    BatchNormTorch,
    Conv2dTorch,
    MaskedBatchNorm,
    max_pool_mask,
)


class SubMConvBlock(nn.Module):
    """SubMConv2d + BN1d + ReLU (post_act_block 'subm', spconv_backbone_2d.py:9-28)."""

    features: int
    dtype: Any = None

    @nn.compact
    def __call__(self, x, mask, train):
        y = Conv2dTorch(self.features, 3, 1, 1, use_bias=False, dtype=self.dtype, name="conv")(x)
        y = MaskedBatchNorm(eps=BN_EPS_BACKBONE, momentum=BN_MOM_BACKBONE, dtype=self.dtype, name="bn")(
            y, mask, train
        )
        y = nn.relu(y)
        return y * mask[..., None].astype(y.dtype)


def _lane_mask_q(mask, co):
    """(B,H,W) occupancy -> (B,H,W,co) int8 0/1 — the fused int8 kernel's
    lane-expanded epilogue mask."""
    return jnp.broadcast_to(
        mask[..., None].astype(jnp.int8), (*mask.shape, co))


class SparseDownBlock(nn.Module):
    """Strided SparseConv2d + BN1d + ReLU (post_act_block 'spconv').

    Returns (features, dilated mask). With ``int8_static`` (frozen-teacher
    eval chain) the stride-2 conv runs as a 2x2 conv on the space-to-depth
    packing of the int8 carry (backbone_s2d.pack_down_kernel tap algebra)
    through the fused Pallas link; ``int8_carry`` keeps the output int8 for
    the next chained stage, else the link dequantizes (chain terminus)."""

    features: int
    dtype: Any = None
    int8: bool = False
    int8_static: bool = False
    int8_carry: bool = False
    fp_block: bool = False   # frozen-teacher fused bf16 link (eval only)

    @nn.compact
    def __call__(self, x, mask, train, new_mask=None):
        # new_mask: optionally host-precomputed (data/host_precompute.
        # mask_pyramid) — the XLA reduce_window dilation ran at 5-16 GB/s
        # (~8 ms/step across the strided stages, PERF.md r4)
        if new_mask is None:
            new_mask = max_pool_mask(mask, 3, 2, 1)
        conv = Conv2dTorch(self.features, 3, 2, 1, use_bias=False, dtype=self.dtype, int8=self.int8, name="conv")
        bn = MaskedBatchNorm(eps=BN_EPS_BACKBONE, momentum=BN_MOM_BACKBONE, dtype=self.dtype, name="bn")
        if self.int8_static and not train:
            from .backbone_s2d import pack_down_kernel, space_to_depth
            from .layers import deq8, int8_qkernel
            from ..ops.pallas_conv_block import int8_block

            xq, bnd, zero = x
            cin = xq.shape[-1]
            k, _ = conv(xq, raw=True)
            kq, sw = int8_qkernel(
                pack_down_kernel(k.astype(jnp.float32), cin, self.features))
            gt, sh, bnd_o = bn(kq, new_mask, False, affine=True)
            out = int8_block(
                (space_to_depth(xq), bnd, zero), kq, sw, None, gt, sh,
                bnd_o, new_mask[..., None].astype(jnp.int8))
            if self.int8_carry:
                return out, new_mask
            return deq8(*out).astype(self.dtype or jnp.float32), new_mask
        if self.fp_block and not train:
            # frozen-teacher fused bf16 link: the strided SparseConv2d as a
            # 2x2 conv on the space-to-depth packing (same tap algebra as
            # the int8 chain's down link), BN-affine+relu+mask fused. The
            # incoming carry may be lane-padded (PillarRes18 doubles
            # channels per stage, so the real cin is features//2); the
            # packed kernel's pad rows are zero.
            from .backbone_s2d import pack_down_kernel, space_to_depth
            from ..ops.pallas_conv_block import fp_block_conv

            dt = self.dtype or x.dtype
            cin = self.features // 2
            assert x.shape[-1] in (cin, -(-cin // 128) * 128), x.shape
            k, _ = conv(x[..., :cin], raw=True)
            kf = k.astype(jnp.float32)
            if x.shape[-1] != cin:  # padded carry: zero kernel rows
                kf = jnp.pad(kf, ((0, 0), (0, 0),
                                  (0, x.shape[-1] - cin), (0, 0)))
            kp = pack_down_kernel(kf, x.shape[-1], self.features)
            gt, sh, _ = bn(kp, new_mask, False, affine=True)
            y = fp_block_conv(
                space_to_depth(x.astype(dt)), kp, None, gt, sh,
                new_mask[..., None].astype(jnp.int8), keep_pad=True)
            return y, new_mask
        y = conv(x)
        y = bn(y, new_mask, train)
        y = nn.relu(y)
        return y * new_mask[..., None].astype(y.dtype), new_mask


class SparseBasicBlock(nn.Module):
    """Residual submanifold block (spconv_backbone_2d.py:41-77).

    conv/bn/relu -> conv/bn -> +identity -> relu, all on the same active set.
    The reference's SubMConv2d here has bias=True (bias passed `norm_fn is
    not None` — a quirk kept for weight-compat)."""

    features: int
    dtype: Any = None
    int8: bool = False
    int8_static: bool = False
    fp_block: bool = False   # frozen-teacher fused bf16 links (eval only)

    @nn.compact
    def __call__(self, x, mask, train):
        conv1 = Conv2dTorch(self.features, 3, 1, 1, use_bias=True, dtype=self.dtype, int8=self.int8, name="conv1")
        bn1 = MaskedBatchNorm(eps=BN_EPS_BACKBONE, momentum=BN_MOM_BACKBONE, dtype=self.dtype, name="bn1")
        conv2 = Conv2dTorch(self.features, 3, 1, 1, use_bias=True, dtype=self.dtype, int8=self.int8, name="conv2")
        bn2 = MaskedBatchNorm(eps=BN_EPS_BACKBONE, momentum=BN_MOM_BACKBONE, dtype=self.dtype, name="bn2")
        if self.int8_static and not train:
            # frozen-teacher chain: both links as fused Pallas int8 kernels,
            # residual added on the second link's accumulator (same algebra
            # as backbone_s2d.S2DBasicBlock's chain path)
            from ..ops.pallas_conv_block import int8_block

            xq = x[0]
            mc = mask[..., None].astype(jnp.int8)
            kq1, sw1, b1 = conv1(xq, qpieces=True)
            gt1, sh1, bnd1 = bn1(xq, mask, False, affine=True)
            q1 = int8_block(x, kq1, sw1, b1, gt1, sh1, bnd1, mc)
            kq2, sw2, b2 = conv2(xq, qpieces=True)
            gt2, sh2, bnd2 = bn2(xq, mask, False, affine=True)
            return int8_block(q1, kq2, sw2, b2, gt2, sh2, bnd2, mc, res=x)
        if self.fp_block and not train:
            # frozen-teacher fused bf16 links (stages where int8 quality-
            # rejected): conv+BN-affine+relu+mask in one kernel per link,
            # residual on the second link's accumulator. The carry may be
            # LANE-PADDED to 128 (kernel DMA alignment — pallas_conv_block
            # docstring); param shapes come from the real channel count and
            # the block returns keep_pad'ed so the chain pads once.
            from ..ops.pallas_conv_block import fp_block_conv

            dt = self.dtype or x.dtype
            x = x.astype(dt)
            f = self.features
            b_, h_, w_, cx = x.shape
            if f % 128 and (2 * f) % 128 == 0 and w_ % 2 == 0:
                # W-PAIRED fused links for C=64 stages (teacher stage 2 at
                # 720²): (B,H,W,C) -> (B,H,W/2,2C) is a FREE contiguous
                # reshape, making K=2C=128 and N=3·2Co=384 exactly lane-
                # aligned — the straight C=64 fp links paid a 2x K-pad + 2x
                # N-pad MXU tax and measured a LOSS (PERF.md r4). The
                # packed kernel's structural zeros (6 of 12 (Δu,p,q) taps)
                # cost 2x FLOPs at ~2.5x the MXU rate; math is exact
                # (tests/test_wpair.py).
                from .backbone_s2d import wpair_kernel

                if cx != f:
                    x = x[..., :f]  # padded carry: wpair needs real lanes
                xw = x.reshape(b_, h_, w_ // 2, 2 * f)
                mw = mask.reshape(b_, h_, w_ // 2, 2).astype(jnp.int8)
                two = lambda v: jnp.concatenate([v, v])
                k1, b1 = conv1(x, raw=True)
                gt1, sh1, _ = bn1(x, mask, False, affine=True)
                y = fp_block_conv(xw, wpair_kernel(k1), two(b1), two(gt1),
                                  two(sh1), mw)
                k2, b2 = conv2(x, raw=True)
                gt2, sh2, _ = bn2(x, mask, False, affine=True)
                y = fp_block_conv(y, wpair_kernel(k2), two(b2), two(gt2),
                                  two(sh2), mw, res=xw)
                return y.reshape(b_, h_, w_, f)
            xs = x[..., :self.features]  # real channels (param shapes only)
            mc = mask[..., None].astype(jnp.int8)
            k1, b1 = conv1(xs, raw=True)
            gt1, sh1, _ = bn1(xs, mask, False, affine=True)
            y = fp_block_conv(x, k1, b1, gt1, sh1, mc, keep_pad=True)
            k2, b2 = conv2(xs, raw=True)
            gt2, sh2, _ = bn2(xs, mask, False, affine=True)
            return fp_block_conv(y, k2, b2, gt2, sh2, mc, res=x,
                                 keep_pad=True)
        # (An S2_WPAIR frozen-eval W-paired XLA formulation of this block
        # lived here briefly in r5: plain XLA convs on the free
        # (B,H,W/2,128) reshape with wpair_kernel, targeting the 3.7 ms of
        # copies+pads around each C=64 conv custom-call. Hardware A/B:
        # 10.131 vs 10.105/10.011 baseline -- a WASH (the paired conv's 2x
        # structural-FLOPs + its own layouts cost what the copies did).
        # Deleted per the no-unproven-gated-paths rule; wpair_kernel + the
        # conv-equivalence test remain with the fp-chain tombstone.)
        m = mask[..., None].astype(x.dtype)
        y = conv1(x)
        y = bn1(y, mask, train)
        y = nn.relu(y) * m
        y = conv2(y)
        y = bn2(y, mask, train)
        return nn.relu(y + x) * m


class DenseBasicBlock(nn.Module):
    """Dense residual block for conv5 (spconv_backbone_2d.py:80-112)."""

    features: int
    dtype: Any = None
    int8: bool = False
    int8_static: bool = False
    fp_block: bool = False   # frozen-teacher fused bf16 links (eval only)

    @nn.compact
    def __call__(self, x, train):
        conv1 = Conv2dTorch(self.features, 3, 1, 1, use_bias=True, dtype=self.dtype, int8=self.int8, name="conv1")
        bn1 = BatchNormTorch(eps=BN_EPS_BACKBONE, momentum=BN_MOM_BACKBONE, dtype=self.dtype, name="bn1")
        conv2 = Conv2dTorch(self.features, 3, 1, 1, use_bias=True, dtype=self.dtype, int8=self.int8, name="conv2")
        bn2 = BatchNormTorch(eps=BN_EPS_BACKBONE, momentum=BN_MOM_BACKBONE, dtype=self.dtype, name="bn2")
        if self.int8_static and not train:
            # frozen-teacher chain at the dense conv5 stage: no sparsity —
            # the epilogue mask is all-ones (it still kills the kernel's
            # internal W-pad columns, which pad the mask with 0)
            from ..ops.pallas_conv_block import int8_block

            xq = x[0]
            mc = jnp.ones(xq.shape[:3] + (1,), jnp.int8)
            kq1, sw1, b1 = conv1(xq, qpieces=True)
            gt1, sh1, bnd1 = bn1(xq, False, affine=True)
            q1 = int8_block(x, kq1, sw1, b1, gt1, sh1, bnd1, mc)
            kq2, sw2, b2 = conv2(xq, qpieces=True)
            gt2, sh2, bnd2 = bn2(xq, False, affine=True)
            return int8_block(q1, kq2, sw2, b2, gt2, sh2, bnd2, mc, res=x)
        if self.fp_block and not train:
            from ..ops.pallas_conv_block import fp_block_conv

            dt = self.dtype or x.dtype
            x = x.astype(dt)
            mc = jnp.ones(x.shape[:3] + (1,), jnp.int8)
            k1, b1 = conv1(x, raw=True)
            gt1, sh1, _ = bn1(x, False, affine=True)
            y = fp_block_conv(x, k1, b1, gt1, sh1, mc)
            k2, b2 = conv2(x, raw=True)
            gt2, sh2, _ = bn2(x, False, affine=True)
            return fp_block_conv(y, k2, b2, gt2, sh2, mc, res=x)
        y = conv1(x)
        y = bn1(y, train)
        y = nn.relu(y)
        y = conv2(y)
        y = bn2(y, train)
        return nn.relu(y + x)


class PillarBackBone8x(nn.Module):
    """Non-residual variant (spconv_backbone_2d.py:115-205): each stage is
    [down +] 2x SubMConv blocks instead of residual blocks."""

    dtype: Any = None
    channels = (32, 64, 128, 256, 256)

    @nn.compact
    def __call__(self, bev, mask, train: bool) -> Dict[str, jnp.ndarray]:
        x = bev * mask[..., None].astype(bev.dtype)
        x = SubMConvBlock(32, self.dtype, name="conv1_0")(x, mask, train)
        x1 = SubMConvBlock(32, self.dtype, name="conv1_1")(x, mask, train)

        x, mask2 = SparseDownBlock(64, self.dtype, name="conv2_down")(x1, mask, train)
        x = SubMConvBlock(64, self.dtype, name="conv2_0")(x, mask2, train)
        x2 = SubMConvBlock(64, self.dtype, name="conv2_1")(x, mask2, train)

        x, mask3 = SparseDownBlock(128, self.dtype, name="conv3_down")(x2, mask2, train)
        x = SubMConvBlock(128, self.dtype, name="conv3_0")(x, mask3, train)
        x3 = SubMConvBlock(128, self.dtype, name="conv3_1")(x, mask3, train)

        x, mask4 = SparseDownBlock(256, self.dtype, name="conv4_down")(x3, mask3, train)
        x = SubMConvBlock(256, self.dtype, name="conv4_0")(x, mask4, train)
        x4 = SubMConvBlock(256, self.dtype, name="conv4_1")(x, mask4, train)

        def dense_block(x, name):
            y = Conv2dTorch(256, 3, 1, 1, use_bias=False, dtype=self.dtype, name=f"{name}_conv")(x)
            y = BatchNormTorch(BN_EPS_BACKBONE, BN_MOM_BACKBONE, dtype=self.dtype, name=f"{name}_bn")(y, train)
            return nn.relu(y)

        x = Conv2dTorch(256, 3, 2, 1, use_bias=False, dtype=self.dtype, name="conv5_down_conv")(x4)
        x = BatchNormTorch(BN_EPS_BACKBONE, BN_MOM_BACKBONE, dtype=self.dtype, name="conv5_down_bn")(x, train)
        x = nn.relu(x)
        x = dense_block(x, "conv5_0")
        x5 = dense_block(x, "conv5_1")

        return {
            "x_conv1": x1, "x_conv2": x2, "x_conv3": x3, "x_conv4": x4, "x_conv5": x5,
            "mask1": mask, "mask2": mask2, "mask3": mask3, "mask4": mask4,
        }


class PillarRes18BackBone8x(nn.Module):
    """Masked-dense twin-capable sparse encoder.

    Input: (B, H, W, 32) dense BEV + (B, H, W) occupancy mask from the VFE.
    Output dict mirrors the reference's ``multi_scale_2d_features``
    (x_conv1..x_conv5 at strides 1,2,4,8,16; x_conv4/x_conv5 dense).
    """

    dtype: Any = None
    channels = (32, 64, 128, 256, 256)
    int8: bool = False   # frozen-teacher int8 conv path (layers.int8_conv)

    @nn.compact
    def __call__(self, bev, mask, train: bool) -> Dict[str, jnp.ndarray]:
        q = self.int8
        x = bev * mask[..., None].astype(bev.dtype)

        # conv1: two residual blocks at stride 1
        x = SparseBasicBlock(32, self.dtype, int8=q, name="conv1_0")(x, mask, train)
        x1 = SparseBasicBlock(32, self.dtype, int8=q, name="conv1_1")(x, mask, train)

        # conv2: down + 2 blocks
        x, mask2 = SparseDownBlock(64, self.dtype, int8=q, name="conv2_down")(x1, mask, train)
        x = SparseBasicBlock(64, self.dtype, int8=q, name="conv2_0")(x, mask2, train)
        x2 = SparseBasicBlock(64, self.dtype, int8=q, name="conv2_1")(x, mask2, train)

        # conv3
        x, mask3 = SparseDownBlock(128, self.dtype, int8=q, name="conv3_down")(x2, mask2, train)
        x = SparseBasicBlock(128, self.dtype, int8=q, name="conv3_0")(x, mask3, train)
        x3 = SparseBasicBlock(128, self.dtype, int8=q, name="conv3_1")(x, mask3, train)

        # conv4
        x, mask4 = SparseDownBlock(256, self.dtype, int8=q, name="conv4_down")(x3, mask3, train)
        x = SparseBasicBlock(256, self.dtype, int8=q, name="conv4_0")(x, mask4, train)
        x4 = SparseBasicBlock(256, self.dtype, int8=q, name="conv4_1")(x, mask4, train)
        # `.dense()` (spconv_backbone_2d.py:299) is the identity here.

        # conv5: dense stride-2 stage
        x = Conv2dTorch(256, 3, 2, 1, use_bias=False, dtype=self.dtype, int8=q, name="conv5_down_conv")(x4)
        x = BatchNormTorch(BN_EPS_BACKBONE, BN_MOM_BACKBONE, dtype=self.dtype, name="conv5_down_bn")(x, train)
        x = nn.relu(x)
        x = DenseBasicBlock(256, self.dtype, int8=q, name="conv5_0")(x, train)
        x5 = DenseBasicBlock(256, self.dtype, int8=q, name="conv5_1")(x, train)

        return {
            "x_conv1": x1,
            "x_conv2": x2,
            "x_conv3": x3,
            "x_conv4": x4,
            "x_conv5": x5,
            "mask1": mask,
            "mask2": mask2,
            "mask3": mask3,
            "mask4": mask4,
        }
