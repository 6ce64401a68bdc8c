"""Space-to-depth variant of the PillarNet sparse encoder.

Motivation (see PERF.md device profile): stage 1 of PillarRes18BackBone8x
runs at (B, 1440, 1440, 32). C=32 fills only a quarter of the TPU's 128
vector lanes, so XLA picks T(2,128)-style layouts and spends ~25% of the
train step copying/relayouting the 265 MB activations, with masked-BN
reductions crawling at 66 GB/s.

Fix: run stage 1 on a 2×2 space-to-depth packing — (B, 720, 720, 128) with
channel index = phase*C + c, phase = (y%2)*2 + x%2. Every op is constructed
to be EXACTLY equivalent to the dense-grid stage (same math, same parameter
tree — checkpoints interchange freely):

- A 3×3 stride-1 subm conv on the original grid becomes a 3×3 conv on the
  packed grid whose (4Cin, 4Cout) kernel is assembled from the original
  (3,3,Cin,Cout) weights: packed tap (Δu, q→p) carries original tap
  dy = 2Δu + qy − py when |dy| ≤ 1, else zero. Per-original-pixel FLOPs go
  9C² → 36C², but lane utilization goes 32/128 → 128/128 and the layout
  churn disappears (the MXU was never the bottleneck here).
- The stride-2 SparseConv2d consuming stage 1 becomes a 2×2 conv on the
  packed grid (output grid 720² == packed grid), padding (1,0) per dim:
  original tap dy = 2Δu + qy, Δu ∈ {−1, 0}.
- Masked BN statistics are computed per packed channel (a 128-lane
  reduction) and folded across the 4 phases — numerically the same masked
  per-original-channel sums; parameters/running stats stay (C,).

Reference semantics: pcdet/models/backbones_3d/spconv_backbone_2d.py
:208-324 (PillarRes18BackBone8x) — this is a pure performance re-layout of
models/backbone_sparse2d.py, equivalence-tested against it
(tests/test_s2d_backbone.py).
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
    conv_kernel_init_torch,
    max_pool_mask,
)
from .backbone_sparse2d import DenseBasicBlock, SparseBasicBlock, SparseDownBlock


# ---------------------------------------------------------------------------
# pack / unpack
# ---------------------------------------------------------------------------


def space_to_depth(x):
    """(B, H, W, C) -> (B, H/2, W/2, 4C), channel = ((y%2)*2 + x%2)*C + c."""
    b, h, w, c = x.shape
    x = x.reshape(b, h // 2, 2, w // 2, 2, c)
    x = x.transpose(0, 1, 3, 2, 4, 5)
    return x.reshape(b, h // 2, w // 2, 4 * c)


def depth_to_space(x, c):
    """Inverse of space_to_depth for original channel count c."""
    b, h2, w2, _ = x.shape
    x = x.reshape(b, h2, w2, 2, 2, c)
    x = x.transpose(0, 1, 3, 2, 4, 5)
    return x.reshape(b, h2 * 2, w2 * 2, c)


def pack_mask(mask):
    """(B, H, W) occupancy -> (B, H/2, W/2, 4) float (phase-major)."""
    return space_to_depth(mask[..., None].astype(jnp.float32))


def _phase_mask_flat(mask_p, c):
    """(B, h, w, 4) -> (B, h, w, 4c) per-phase multiplier. Broadcast +
    reshape (no materialized repeat — XLA fuses it into consumers)."""
    b, h, w, _ = mask_p.shape
    m = jnp.broadcast_to(mask_p[..., :, None], (b, h, w, 4, c))
    return m.reshape(b, h, w, 4 * c)


# ---------------------------------------------------------------------------
# packed kernel assembly (static index maps, traced once; weight tensors are
# tiny so the 144-slot assembly is negligible next to the convs)
# ---------------------------------------------------------------------------


def pack_subm_kernel(k, cin, cout):
    """(3,3,Cin,Cout) original kernel -> (3,3,4Cin,4Cout) packed kernel.

    Valid taps: dy = 2Δu + qy − py ∈ {−1,0,1} (and likewise in x)."""
    kp = jnp.zeros((3, 3, 4 * cin, 4 * cout), k.dtype)
    for py in range(2):
        for px in range(2):
            p = py * 2 + px
            for qy in range(2):
                for qx in range(2):
                    q = qy * 2 + qx
                    for du in (-1, 0, 1):
                        dy = 2 * du + qy - py
                        if abs(dy) > 1:
                            continue
                        for dv in (-1, 0, 1):
                            dx = 2 * dv + qx - px
                            if abs(dx) > 1:
                                continue
                            kp = kp.at[
                                du + 1, dv + 1,
                                q * cin:(q + 1) * cin,
                                p * cout:(p + 1) * cout,
                            ].set(k[dy + 1, dx + 1])
    return kp


def pack_down_kernel(k, cin, cout):
    """(3,3,Cin,Cout) stride-2 kernel -> (2,2,4Cin,Cout) packed stride-1
    kernel (output grid == packed grid; padding (1,0) per dim). Valid taps:
    dy = 2Δu + qy, kernel index Δu+1, Δu ∈ {−1, 0}."""
    kp = jnp.zeros((2, 2, 4 * cin, cout), k.dtype)
    for qy in range(2):
        for qx in range(2):
            q = qy * 2 + qx
            for du in (-1, 0):
                dy = 2 * du + qy
                if abs(dy) > 1:
                    continue
                for dv in (-1, 0):
                    dx = 2 * dv + qx
                    if abs(dx) > 1:
                        continue
                    kp = kp.at[du + 1, dv + 1, q * cin:(q + 1) * cin, :].set(
                        k[dy + 1, dx + 1]
                    )
    return kp


def wpair_kernel(k):
    """(3,3,C,Co) stride-1 kernel -> (3,3,2C,2Co) stride-1 kernel on the
    W-PAIRED layout ((B,H,W,C) -> (B,H,W/2,2C), a free contiguous reshape:
    lane index = (w%2)*C + c).

    Valid taps: orig dx = 2Δu + p − q ∈ {−1,0,1} (input phase p, output
    phase q) — 6 of the 12 (Δu,p,q) combos, i.e. the packed kernel is 50%
    structural zeros. Purpose: C=64 stride-1 convs (teacher stage 2 at
    720²) pay a 2x N-pad + 2x K-pad MXU tax in the fused fp links
    (PERF.md r4 FP_STAGES loss); W-pairing makes K=2C=128 and N=3·2Co=384
    exactly lane-aligned, trading only the 2x structural-zero FLOPs —
    net ~2x effective MXU rate at the same exact math."""
    kh, kw, ci, co = k.shape
    assert kh == 3 and kw == 3, (kh, kw)
    kp = jnp.zeros((3, 3, 2 * ci, 2 * co), k.dtype)
    for du in (-1, 0, 1):
        for p in range(2):
            for q in range(2):
                dx = 2 * du + p - q
                if abs(dx) > 1:
                    continue
                kp = kp.at[:, du + 1, p * ci:(p + 1) * ci,
                           q * co:(q + 1) * co].set(k[:, dx + 1])
    return kp


def pack_down_kernel_packed_out(k, cin, cout):
    """(3,3,Cin,Cout) stride-2 kernel -> (3,3,4Cin,4Cout) stride-2 conv on
    the PACKED input grid producing the PACKED next-stage grid (both grids
    stay space-to-depth packed). Valid taps: dy = 2Δu + qy − 2py ∈ {−1,0,1}
    (output phase p of the next stage's packing, input phase q)."""
    kp = jnp.zeros((3, 3, 4 * cin, 4 * cout), k.dtype)
    for py in range(2):
        for px in range(2):
            p = py * 2 + px
            for qy in range(2):
                for qx in range(2):
                    q = qy * 2 + qx
                    for du in (-1, 0, 1):
                        dy = 2 * du + qy - 2 * py
                        if abs(dy) > 1:
                            continue
                        for dv in (-1, 0, 1):
                            dx = 2 * dv + qx - 2 * px
                            if abs(dx) > 1:
                                continue
                            kp = kp.at[
                                du + 1, dv + 1,
                                q * cin:(q + 1) * cin,
                                p * cout:(p + 1) * cout,
                            ].set(k[dy + 1, dx + 1])
    return kp


def _conv(x, kernel, padding, stride=1):
    return jax.lax.conv_general_dilated(
        x, kernel, window_strides=(stride, stride), padding=padding,
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
    )


# ---------------------------------------------------------------------------
# packed modules — parameter trees IDENTICAL to the dense variants
# ---------------------------------------------------------------------------


class _KernelHolder(nn.Module):
    """Owns the original-layout conv params under the same path nn.Conv
    would ('<name>/kernel', '<name>/bias') so checkpoints interchange."""

    cin: int
    cout: int
    use_bias: bool

    @nn.compact
    def __call__(self):
        k = self.param("kernel", conv_kernel_init_torch, (3, 3, self.cin, self.cout))
        b = self.param("bias", nn.initializers.zeros, (self.cout,)) if self.use_bias else None
        return k, b


class _ConvScope(nn.Module):
    """Extra scope level mirroring Conv2dTorch('x')->nn.Conv('conv')."""

    cin: int
    cout: int
    use_bias: bool

    @nn.compact
    def __call__(self):
        return _KernelHolder(self.cin, self.cout, self.use_bias, name="conv")()


class _PackedSubmConv(nn.Module):
    """3×3 subm conv on the packed grid; params = original (3,3,Cin,Cout)."""

    cin: int
    cout: int
    use_bias: bool
    dtype: Any = None
    int8: bool = False

    @nn.compact
    def __call__(self, x, pieces: bool = False):
        from .layers import int8_conv, int8_qkernel

        k, b = _KernelHolder(self.cin, self.cout, self.use_bias, name="conv")()
        if pieces:
            # int8-static chain: packed quantized kernel + dequant scales
            kp = pack_subm_kernel(k.astype(jnp.float32), self.cin, self.cout)
            kq, sw = int8_qkernel(kp)
            b4 = jnp.tile(b, 4).astype(jnp.float32) if b is not None else None
            return kq, sw, b4
        dt = self.dtype or x.dtype
        if self.int8:
            kp = pack_subm_kernel(k, self.cin, self.cout)
            b4 = jnp.tile(b, 4) if b is not None else None
            return int8_conv(x, kp, 1, ((1, 1), (1, 1)), b4, out_dtype=dt)
        kp = pack_subm_kernel(k.astype(dt), self.cin, self.cout)
        y = _conv(x.astype(dt), kp, ((1, 1), (1, 1)))
        if b is not None:
            y = y + jnp.tile(b, 4).astype(y.dtype)
        return y


class PackedMaskedBatchNorm(nn.Module):
    """MaskedBatchNorm on (B,h,w,4C) packed features with (B,h,w,4) packed
    mask; statistics folded across phases == the dense masked stats.
    Param/batch_stats layout identical to MaskedBatchNorm ((C,) vectors)."""

    features: int
    eps: float = BN_EPS_BACKBONE
    momentum: float = BN_MOM_BACKBONE
    dtype: Any = None

    @nn.compact
    def __call__(self, x, mask_p, train: bool, affine: bool = False):
        c = self.features
        scale = self.param("scale", nn.initializers.ones, (c,))
        bias = self.param("bias", nn.initializers.zeros, (c,))
        ra_mean = self.variable("batch_stats", "mean", lambda: jnp.zeros((c,)))
        ra_var = self.variable("batch_stats", "var", lambda: jnp.ones((c,)))

        if affine:
            # int8-static chain (layers.py): eval-BN as a packed affine
            from .layers import INT8_SIGMA

            assert not train
            gt = jax.lax.rsqrt(ra_var.value + self.eps) * scale
            shift = bias - ra_mean.value * gt
            bound = jnp.max(jnp.abs(bias) + INT8_SIGMA * jnp.abs(scale))
            return jnp.tile(gt, 4), jnp.tile(shift, 4), bound

        if train:
            # multiply in the compute dtype, ACCUMULATE in f32 (dtype= on the
            # reduce) — avoids materializing a f32 copy of the 4C map
            mf = _phase_mask_flat(mask_p, c).astype(x.dtype)
            xm = x * mf
            n = jnp.clip(jnp.sum(mask_p.astype(jnp.float32)), 1.0)
            s1 = jnp.sum(xm, axis=(0, 1, 2), dtype=jnp.float32).reshape(4, c).sum(0)
            s2 = jnp.sum(xm * x, axis=(0, 1, 2), dtype=jnp.float32).reshape(4, c).sum(0)
            mean = s1 / n
            var = jnp.maximum(s2 / n - mean * mean, 0.0)
            if not self.is_initializing():
                unbiased = var * n / jnp.clip(n - 1.0, 1.0)
                ra_mean.value = (1 - self.momentum) * ra_mean.value + self.momentum * mean
                ra_var.value = (1 - self.momentum) * ra_var.value + self.momentum * unbiased
        else:
            mean, var = ra_mean.value, ra_var.value

        mean4 = jnp.tile(mean, 4)
        inv4 = jnp.tile(jax.lax.rsqrt(var + self.eps) * scale, 4)
        bias4 = jnp.tile(bias, 4)
        y = (x - mean4) * inv4 + bias4
        return y.astype(self.dtype or x.dtype)


class S2DBasicBlock(nn.Module):
    """SparseBasicBlock on the packed grid (param tree == SparseBasicBlock)."""

    features: int
    dtype: Any = None
    int8: bool = False
    int8_static: bool = False

    @nn.compact
    def __call__(self, x, mask_p, train):
        c = self.features
        conv1 = _PackedSubmConv(c, c, use_bias=True, dtype=self.dtype, int8=self.int8, name="conv1")
        bn1 = PackedMaskedBatchNorm(c, dtype=self.dtype, name="bn1")
        conv2 = _PackedSubmConv(c, c, use_bias=True, dtype=self.dtype, int8=self.int8, name="conv2")
        bn2 = PackedMaskedBatchNorm(c, dtype=self.dtype, name="bn2")

        if self.int8_static and not train:
            # int8 chain: whole link (int8 MXU conv + dequant·BN·relu·mask·
            # requant epilogue) as ONE fused Pallas kernel — expressed in
            # XLA the int32 conv output round-trips HBM and the chain LOSES
            # to bf16 (PERF.md r3). v2 kernel: compact 4-phase mask, halo
            # DMA'd in-kernel (the v1 lax.pad + lane-expanded mask cost
            # ~2.3 ms/conv of pure copies at stage 1 — PERF.md r4)
            from ..ops.pallas_conv_block import int8_block

            mc = mask_p.astype(jnp.int8)
            kq1, sw1, b1 = conv1(None, pieces=True)
            gt1, sh1, bnd1 = bn1(None, mask_p, False, affine=True)
            q1 = int8_block(x, kq1, sw1, b1, gt1, sh1, bnd1, mc)
            kq2, sw2, b2 = conv2(None, pieces=True)
            gt2, sh2, bnd2 = bn2(None, mask_p, False, affine=True)
            return int8_block(q1, kq2, sw2, b2, gt2, sh2, bnd2, mc, res=x)

        m = _phase_mask_flat(mask_p, c).astype(x.dtype)
        y = conv1(x)
        y = bn1(y, mask_p, train)
        y = nn.relu(y) * m
        y = conv2(y)
        y = bn2(y, mask_p, train)
        return nn.relu(y + x) * m


class S2DDownBlock(nn.Module):
    """Stride-2 SparseConv2d consuming the packed stage: 2×2 packed conv,
    emits the UNPACKED next-stage tensor. Param tree == SparseDownBlock."""

    cin: int
    features: int
    dtype: Any = None
    int8: bool = False
    int8_static: bool = False
    int8_carry: bool = False   # keep the chain int8 into the next stage
    fp_next: bool = False      # next stage runs the fused-fp chain: emit the
                               # terminus float LANE-PADDED (DMA alignment)

    @nn.compact
    def __call__(self, x_packed, mask, train, new_mask=None):
        from .layers import int8_conv, int8_qkernel

        # mask: ORIGINAL-resolution (B, H, W) occupancy (tiny; bookkeeping
        # stays at original resolution); new_mask: optionally host-built
        # (data/host_precompute.mask_pyramid)
        if new_mask is None:
            new_mask = max_pool_mask(mask, 3, 2, 1)
        k, _ = _ConvScope(self.cin, self.features, False, name="conv")()
        bn = MaskedBatchNorm(eps=BN_EPS_BACKBONE, momentum=BN_MOM_BACKBONE,
                             dtype=self.dtype, name="bn")
        if self.int8_static and not train and self.int8_carry:
            # chain CONTINUES (INT8_STAGES >= 2): the 2x2 packed-grid down
            # conv runs as the fused Pallas link, emitting the stage-2 int8
            # carry (backbone_sparse2d.SparseBasicBlock consumes it)
            from ..ops.pallas_conv_block import int8_block

            kq, sw = int8_qkernel(pack_down_kernel(
                k.astype(jnp.float32), self.cin, self.features))
            gt, sh, bnd_o = bn(kq, new_mask, False, affine=True)
            return int8_block(
                x_packed, kq, sw, None, gt, sh, bnd_o,
                new_mask[..., None].astype(jnp.int8)), new_mask
        if self.int8_static and not train:
            # chain TERMINUS: consume the int8 carry with one XLA int8 conv
            # and return FLOAT — stage 2 runs the float path (the stage-2
            # C=64 shapes are where int8 stops paying; PERF.md r3). A fused
            # deq_out kernel variant was MEASURED WORSE here (r4: 12.2 vs
            # 5.5 ms — the kernel must write the lane-PADDED bf16 output
            # (Mosaic 128-lane accumulator slices) + a slice copy, 2.5x the
            # bytes of this link's real output; it also degraded the
            # downstream stage-2 convs' layouts).
            from .layers import int8_conv_affine

            kq, sw = int8_qkernel(pack_down_kernel(
                k.astype(jnp.float32), self.cin, self.features))
            gt, sh, _ = bn(kq, new_mask, False, affine=True)
            y = int8_conv_affine(x_packed, kq, sw, None, gt, sh, 1, ((1, 0), (1, 0)))
            y = nn.relu(y) * new_mask[..., None].astype(jnp.float32)
            y = y.astype(self.dtype or jnp.float32)
            if self.fp_next and y.shape[-1] % 128:
                y = jnp.pad(y, ((0, 0), (0, 0), (0, 0),
                                (0, 128 - y.shape[-1] % 128)))
            return y, new_mask
        dt = self.dtype or x_packed.dtype
        if self.int8:
            kp = pack_down_kernel(k, self.cin, self.features)
            y = int8_conv(x_packed, kp, 1, ((1, 0), (1, 0)), out_dtype=dt)
        else:
            kp = pack_down_kernel(k.astype(dt), self.cin, self.features)
            y = _conv(x_packed.astype(dt), kp, ((1, 0), (1, 0)))
        y = bn(y, new_mask, train)
        y = nn.relu(y)
        return y * new_mask[..., None].astype(y.dtype), new_mask


class S2DDownBlockPacked(nn.Module):
    """Stride-2 SparseConv2d that keeps BOTH grids packed: (h,w,4Cin) ->
    (h/2, w/2, 4Cout). Param tree == SparseDownBlock; BN stats are the
    packed fold over the next stage's packed mask."""

    cin: int
    features: int
    dtype: Any = None
    int8: bool = False
    int8_static: bool = False

    @nn.compact
    def __call__(self, x_packed, mask, train):
        from .layers import int8_conv

        new_mask = max_pool_mask(mask, 3, 2, 1)   # original-resolution bookkeeping
        new_mask_p = pack_mask(new_mask)
        k, _ = _ConvScope(self.cin, self.features, False, name="conv")()
        bn = PackedMaskedBatchNorm(self.features, dtype=self.dtype, name="bn")
        if self.int8_static and not train:
            # packed->packed stride-2 link: XLA int8 conv + fused affine,
            # requant into the next packed stage's int8 carry
            from .layers import int8_conv_affine, int8_qkernel, q8

            kq, sw = int8_qkernel(pack_down_kernel_packed_out(
                k.astype(jnp.float32), self.cin, self.features))
            gt, sh, bnd = bn(None, new_mask_p, False, affine=True)
            y = int8_conv_affine(x_packed, kq, sw, None, gt, sh, 2,
                                 ((1, 1), (1, 1)))
            mf = _phase_mask_flat(new_mask_p, self.features)
            y = nn.relu(y) * mf.astype(jnp.float32)
            return (q8(y, bnd, 127.0), bnd, 127.0), new_mask, new_mask_p
        dt = self.dtype or x_packed.dtype
        if self.int8:
            kp = pack_down_kernel_packed_out(k, self.cin, self.features)
            y = int8_conv(x_packed, kp, 2, ((1, 1), (1, 1)), out_dtype=dt)
        else:
            kp = pack_down_kernel_packed_out(k.astype(dt), self.cin, self.features)
            y = _conv(x_packed.astype(dt), kp, ((1, 1), (1, 1)), stride=2)
        y = bn(y, new_mask_p, train)
        y = nn.relu(y)
        y = y * _phase_mask_flat(new_mask_p, self.features).astype(y.dtype)
        return y, new_mask, new_mask_p


class PillarRes18BackBone8xS2D(nn.Module):
    """PillarRes18BackBone8x with stage 1 space-to-depth packed.

    Drop-in replacement: same parameter tree, same outputs (x_conv1 is
    returned packed as 'x_conv1_packed' unless unpack_outputs=True — it has
    no consumer in the RadarDistill path and unpacking costs a 265 MB
    relayout)."""

    dtype: Any = None
    unpack_outputs: bool = False
    pack_stage2: bool = False   # also run stage 2 packed (360², 4·64)
    int8: bool = False          # frozen-teacher int8 convs (layers.int8_conv)
    # frozen-teacher STATIC int8 chain: activations flow as int8 between
    # convs, every quantize is a fused epilogue with BN-derived bounds
    # (layers.py int8 narrative); eval/frozen forward only — train falls
    # back to float. Same checkpoint layout (bounds are derived, not stored).
    int8_static: bool = False
    # how deep the static chain runs: 1 = stage 1 only (terminates in the
    # conv2_down XLA link); 2..5 extend it through the later stages as fused
    # Pallas links — strided downs run as 2x2 convs on the space-to-depth
    # packing of the int8 carry, the x_conv3/4/5 taps dequantize on exit.
    # (The r3 "packed stage-2 int8 loses" result was the PACKED-subm 4x-FLOP
    # formulation + XLA links; this chain keeps stages 2+ UNPACKED.)
    int8_stages: int = 1
    # frozen-teacher fused bf16 chain for stages the int8 chain does NOT
    # cover (int8 stage 2+ quality-rejected — PERF.md r3): stages
    # 2..fp_stages run conv+BN-affine+relu+mask as fused Pallas links
    # (ops/pallas_conv_block.fp_block_conv) in eval/frozen forward.
    # Numerically the float path at bf16 resolution; breaks the N=64 lane
    # wall the 720² stage-2 convs sit at (PERF.md r4). 0 = off.
    fp_stages: int = 0
    # table input: consume the sparse VFE's (table, uids) directly and
    # densify straight INTO the packed layout (ops/active_site.py
    # densify_packed) — the dense stride-1 grid never exists in unpacked
    # form, so no gather+transpose fusion can degrade the densify (r2
    # profile: 141 ms/step at bs4 for the plain-layout gather)
    table_input: bool = False
    hw: Any = None              # static (H, W), required when table_input
    # packed-order table input (vfe packed_order=True must match): the entry
    # inverse map + mask are built directly in the packed layout — see the
    # packed branch below and ops/active_site.densify_packed_direct_batch
    packed_table: bool = False

    @nn.compact
    def __call__(self, bev, mask, train: bool, hp_masks=None) -> Dict[str, jnp.ndarray]:
        # hp_masks: optional host-built strided-stage occupancy masks
        # (data/host_precompute.mask_pyramid levels 720²/360²/180²) — the
        # device then skips the 5-16 GB/s reduce_window dilations
        m2h, m3h, m4h = hp_masks if hp_masks is not None else (None,) * 3
        if m2h is not None and m2h.dtype == jnp.uint8:
            # loader ships the pyramid bit-packed along W (8x fewer transfer
            # bytes — the production loop is tunnel-bandwidth-bound); the
            # unpack is three elementwise ops fused into the mask consumers
            from ..utils.bitpack import unpack_bool_jnp

            h0, w0 = self.hw if self.hw is not None else (
                bev.shape[1], bev.shape[2])
            m2h = unpack_bool_jnp(m2h, w0 // 2)
            m3h = unpack_bool_jnp(m3h, w0 // 4)
            m4h = unpack_bool_jnp(m4h, w0 // 8)
        if self.pack_stage2:
            m2h = m3h = m4h = None  # pack branch keeps its own mask path
        q = self.int8
        qs = self.int8_static and not train
        if self.table_input and self.packed_table:
            from ..ops import active_site as asx

            table, uids = bev, mask  # (B, cap, C), (B, cap) PACKED-order
            # packed-order table (vfe packed_order=True): the inverse site
            # map scatters directly at packed addresses and the gather lands
            # in the (h2, w2, 4, C) layout — no index transpose, and the
            # mask is born packed (no pack_mask transpose). The unpacked
            # (B, H, W) mask is reconstructed ONLY for consumers that still
            # need it (mask-pyramid fallback / pack_stage2 bookkeeping).
            if qs:
                from .layers import q8

                # quantize the COMPACT table then densify int8 (exact:
                # gather(q8(t)) == q8(gather(t)); zero-padding-rows
                # invariant as in the non-packed branch below)
                bnd0 = jnp.maximum(
                    jnp.max(jnp.abs(table)).astype(jnp.float32), 1e-6)
                table = q8(table.astype(jnp.float32), bnd0)
            x, mask_pb = asx.densify_packed_direct_batch(table, uids, self.hw)
            if qs:
                x = (x, bnd0, 0.0)
            mask_p = mask_pb.astype(jnp.float32)
            if m2h is None or self.pack_stage2:
                # reconstruct the original-resolution mask only when a
                # consumer actually needs it (no host pyramid / pack branch)
                mask = depth_to_space(mask_p, 1)[..., 0] > 0
            else:
                mask = None
        elif self.table_input:
            # (An ENTRY_EXPAND Pallas-expand A/B variant lived here in r5;
            # deleted unmeasured — packed_table above removes the transpose
            # it was built to avoid, so the A/B question is moot.)
            from ..ops import active_site as asx

            table, uids = bev, mask  # (B, cap, C), (B, cap)
            if qs:
                from .layers import q8

                # quantize the COMPACT table, then densify int8: the
                # entry expansion gather moves 4x fewer bytes (66 vs
                # 265 MB at 1440², PERF.md r4: this gather ran at
                # 80 GB/s), and the dense-grid q8 pass disappears.
                # Exact: q8 is elementwise with a static-per-step
                # scalar bound and q8(0) = 0 (symmetric), so
                # gather(q8(t)) == q8(gather(t)).
                # INVARIANT (advisor r4): bound equality with the
                # dense-side abs-max additionally requires unused
                # compact rows to be exactly zero — guaranteed today by
                # PFNLayerV2Sparse's -inf max-scatter + isneginf->0
                # fill. A table producer with nonzero padding rows
                # would silently inflate this bound.
                bnd0 = jnp.maximum(
                    jnp.max(jnp.abs(table)).astype(jnp.float32), 1e-6)
                table = q8(table.astype(jnp.float32), bnd0)
            x, mask = asx.densify_packed_batch(table, uids, self.hw)
            if qs:
                x = (x, bnd0, 0.0)
            mask_p = pack_mask(mask)
            # inactive cells gather the zero sentinel row: already masked
        else:
            mask_p = pack_mask(mask)
            x = space_to_depth(bev)
            x = x * _phase_mask_flat(mask_p, bev.shape[-1]).astype(x.dtype)
            if qs:
                from .layers import q8

                # stage-entry quantization: ONE dynamic abs-max in the
                # source dtype (max of bf16 values is exact); only the
                # scalar upcasts
                bnd0 = jnp.maximum(
                    jnp.max(jnp.abs(x)).astype(jnp.float32), 1e-6)
                x = (q8(x.astype(jnp.float32), bnd0), bnd0, 0.0)

        if qs:
            from .layers import deq8

            def dq(t):
                return deq8(*t).astype(self.dtype or jnp.float32)
        else:
            def dq(t):
                return t

        # conv1: two residual blocks at stride 1, packed
        x = S2DBasicBlock(32, self.dtype, int8=q, int8_static=qs, name="conv1_0")(x, mask_p, train)
        x1p = S2DBasicBlock(32, self.dtype, int8=q, int8_static=qs, name="conv1_1")(x, mask_p, train)

        # chain depth flags (pack_stage2 keeps its own stage-2 handling)
        stages = 1 if self.pack_stage2 else self.int8_stages
        qs2 = qs and stages >= 2
        qs3 = qs and stages >= 3
        qs4 = qs and stages >= 4
        qs5 = qs and stages >= 5
        # fused-fp chain flags: only where the int8 chain does NOT run
        fp = (not train) and not self.pack_stage2
        fp2 = fp and self.fp_stages >= 2 and not qs2
        fp3 = fp and self.fp_stages >= 3 and not qs3
        fp4 = fp and self.fp_stages >= 4 and not qs4
        fp5 = fp and self.fp_stages >= 5 and not qs5

        if self.pack_stage2:
            # conv2: packed->packed down + 2 packed blocks at (360², 256).
            # Under int8_static the whole stage stays in the int8 chain
            # (the Pallas block kernel runs C=256 / N=768 here) and the
            # chain terminates in conv3_down.
            x, mask2, mask2_p = S2DDownBlockPacked(
                32, 64, self.dtype, int8=q, int8_static=qs, name="conv2_down"
            )(x1p, mask, train)
            x = S2DBasicBlock(64, self.dtype, int8=q, int8_static=qs, name="conv2_0")(x, mask2_p, train)
            x2p = S2DBasicBlock(64, self.dtype, int8=q, int8_static=qs, name="conv2_1")(x, mask2_p, train)
            x2 = None
            # conv3_down consumes the packed stage-2 grid (2×2 packed kernel)
            x, mask3 = S2DDownBlock(64, 128, self.dtype, int8=q, int8_static=qs, name="conv3_down")(x2p, mask2, train)
        else:
            # conv2: packed down + 2 dense-grid blocks at 720². With
            # INT8_STAGES=1 the chain TERMINATES in the conv2_down link and
            # stage 2+ runs float; with INT8_STAGES >= 2 the chain continues
            # UNPACKED through the later stages as fused Pallas links.
            # fp_next=False: the C=64 fp links run W-PAIRED (SparseBasic-
            # Block wpair path) and need the real-lane (..,64) layout — no
            # lane pad (the pad was the old straight-C=64 form's DMA req)
            x, mask2 = S2DDownBlock(
                32, 64, self.dtype, int8=q, int8_static=qs, int8_carry=qs2,
                fp_next=False, name="conv2_down")(x1p, mask, train, m2h)
            x = SparseBasicBlock(64, self.dtype, int8=q, int8_static=qs2,
                                 fp_block=fp2, name="conv2_0")(x, mask2, train)
            x2c = SparseBasicBlock(64, self.dtype, int8=q, int8_static=qs2,
                                   fp_block=fp2, name="conv2_1")(x, mask2, train)
            # fp chain carries the stage LANE-PADDED; slice real channels at
            # the tap (x_conv2 is unconsumed in the distill path -> DCE'd)
            x2 = dq(x2c) if qs2 else (
                x2c[..., :64] if fp2 and x2c.shape[-1] != 64 else x2c)
            x2p = None

            # conv3 (int8 chain if INT8_STAGES >= 3, else float from here)
            x3_in = x2c
            if fp2 and not fp3 and x2c.shape[-1] != 64:
                x3_in = x2c[..., :64]  # float conv3_down needs real lanes
            x, mask3 = SparseDownBlock(
                128, self.dtype, int8=q, int8_static=qs2, int8_carry=qs3,
                fp_block=fp3, name="conv3_down")(x3_in, mask2, train, m3h)
        x = SparseBasicBlock(128, self.dtype, int8=q, int8_static=qs3,
                             fp_block=fp3, name="conv3_0")(x, mask3, train)
        x3c = SparseBasicBlock(128, self.dtype, int8=q, int8_static=qs3,
                               fp_block=fp3, name="conv3_1")(x, mask3, train)
        x3 = dq(x3c) if qs3 else x3c

        # conv4
        x, mask4 = SparseDownBlock(
            256, self.dtype, int8=q, int8_static=qs3, int8_carry=qs4,
            fp_block=fp4, name="conv4_down")(x3c, mask3, train, m4h)
        x = SparseBasicBlock(256, self.dtype, int8=q, int8_static=qs4,
                             fp_block=fp4, name="conv4_0")(x, mask4, train)
        x4c = SparseBasicBlock(256, self.dtype, int8=q, int8_static=qs4,
                               fp_block=fp4, name="conv4_1")(x, mask4, train)
        x4 = dq(x4c) if qs4 else x4c

        # conv5: dense stride-2 stage
        if qs5:
            # stride-2 dense conv as a 2x2 conv on the space-to-depth
            # packing of the int8 carry; plain (unmasked) eval-BN affine
            from .layers import int8_qkernel

            x4q, b4, z4 = x4c
            conv5 = Conv2dTorch(256, 3, 2, 1, use_bias=False,
                                dtype=self.dtype, name="conv5_down_conv")
            k5, _ = conv5(x4q, raw=True)
            kq5, sw5 = int8_qkernel(
                pack_down_kernel(k5.astype(jnp.float32), 256, 256))
            bn5 = BatchNormTorch(BN_EPS_BACKBONE, BN_MOM_BACKBONE,
                                 dtype=self.dtype, name="conv5_down_bn")
            gt5, sh5, bnd5 = bn5(kq5, False, affine=True)
            mq5 = jnp.ones(
                (x4q.shape[0], x4q.shape[1] // 2, x4q.shape[2] // 2, 256),
                jnp.int8)
            from ..ops.pallas_int8_conv import int8_block_conv

            x = int8_block_conv(
                (space_to_depth(x4q), b4, z4), kq5, sw5, None, gt5, sh5,
                bnd5, mq5)
            x = DenseBasicBlock(256, self.dtype, int8=q, int8_static=True, name="conv5_0")(x, train)
            x5 = dq(DenseBasicBlock(256, self.dtype, int8=q, int8_static=True, name="conv5_1")(x, train))
        elif fp5:
            # fused-fp conv5: stride-2 dense conv as a 2x2 conv on the
            # space-to-depth packing (plain eval-BN affine, all-ones mask)
            from ..ops.pallas_conv_block import fp_block_conv

            dt5 = self.dtype or x4.dtype
            conv5 = Conv2dTorch(256, 3, 2, 1, use_bias=False,
                                dtype=self.dtype, name="conv5_down_conv")
            k5, _ = conv5(x4, raw=True)
            kp5 = pack_down_kernel(k5.astype(jnp.float32), 256, 256)
            bn5 = BatchNormTorch(BN_EPS_BACKBONE, BN_MOM_BACKBONE,
                                 dtype=self.dtype, name="conv5_down_bn")
            gt5, sh5, _ = bn5(k5, False, affine=True)
            ones5 = jnp.ones(
                (x4.shape[0], x4.shape[1] // 2, x4.shape[2] // 2, 1), jnp.int8)
            x = fp_block_conv(space_to_depth(x4.astype(dt5)), kp5, None,
                              gt5, sh5, ones5)
            x = DenseBasicBlock(256, self.dtype, fp_block=True, name="conv5_0")(x, train)
            x5 = DenseBasicBlock(256, self.dtype, fp_block=True, name="conv5_1")(x, train)
        else:
            x = Conv2dTorch(256, 3, 2, 1, use_bias=False, dtype=self.dtype, int8=q, name="conv5_down_conv")(x4)
            x = BatchNormTorch(BN_EPS_BACKBONE, BN_MOM_BACKBONE, dtype=self.dtype, name="conv5_down_bn")(x, train)
            x = nn.relu(x)
            x = DenseBasicBlock(256, self.dtype, int8=q, name="conv5_0")(x, train)
            x5 = DenseBasicBlock(256, self.dtype, int8=q, name="conv5_1")(x, train)

        out = {
            "x_conv3": x3, "x_conv4": x4, "x_conv5": x5,
            "mask1": mask, "mask2": mask2, "mask3": mask3, "mask4": mask4,
        }
        if self.unpack_outputs:
            out["x_conv1"] = depth_to_space(dq(x1p), 32)
            out["x_conv2"] = depth_to_space(dq(x2p), 64) if x2 is None else x2
        else:
            out["x_conv1_packed"] = dq(x1p)
            if x2 is None:
                out["x_conv2_packed"] = dq(x2p)
            else:
                out["x_conv2"] = x2
        return out
