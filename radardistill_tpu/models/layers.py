"""Shared NN building blocks (flax.linen, NHWC).

Torch-compatibility notes (these pin the numerics contract to the reference):

- ``Conv2dTorch`` uses explicit symmetric padding so strided convs window
  exactly like ``nn.Conv2d(k=3, s=2, p=1)`` (XLA ``SAME`` pads asymmetrically
  for even inputs — a silent off-by-one vs torch).
- ``ConvTranspose2dTorch`` realises torch's deconv semantics
  (out = (in-1)*s - 2p + k) via input-dilated convolution with a spatially
  flipped kernel — exactly the transpose of the forward conv.
- ``MaskedBatchNorm`` computes statistics over *active* elements only: the
  TPU equivalent of the reference's BatchNorm1d over sparse active-site
  feature lists (spconv_backbone_2d.py:119, dynamic_pillar_vfe.py:29).
  Running stats follow torch convention: ``momentum`` here is the torch
  momentum m (running = (1-m)*running + m*batch).
"""

from __future__ import annotations

from typing import Any, Callable

import jax
import jax.numpy as jnp
from flax import linen as nn

Dtype = Any

# Default eps/momentum pairs used by the reference:
#   sparse backbone + neck BNs: eps=1e-3, momentum=0.01 (spconv_backbone_2d.py:119,244)
#   head / CMA BNs: torch defaults eps=1e-5, momentum=0.1
BN_EPS_BACKBONE, BN_MOM_BACKBONE = 1e-3, 0.01
BN_EPS_DEFAULT, BN_MOM_DEFAULT = 1e-5, 0.1


def kaiming_normal_torch(key, shape, dtype=jnp.float32):
    """torch.nn.init.kaiming_normal_ (fan_in of the conv: in_ch*kh*kw) for
    HWIO kernels."""
    fan_in = shape[0] * shape[1] * shape[2] if len(shape) == 4 else shape[0]
    std = (2.0 / fan_in) ** 0.5
    return jax.random.normal(key, shape, dtype) * std


def conv_kernel_init_torch(key, shape, dtype=jnp.float32):
    """torch Conv2d default init: kaiming_uniform(a=sqrt(5)) ==
    uniform(-1/sqrt(fan_in), 1/sqrt(fan_in)) * sqrt(3)... torch uses
    gain=sqrt(2/(1+5))=sqrt(1/3); bound = sqrt(3)*gain/sqrt(fan_in)
    = 1/sqrt(fan_in)."""
    fan_in = shape[0] * shape[1] * shape[2] if len(shape) == 4 else shape[0]
    bound = 1.0 / (fan_in ** 0.5)
    return jax.random.uniform(key, shape, dtype, -bound, bound)


# ---------------------------------------------------------------------------
# Static-scale int8 chain (frozen teacher). The dynamic int8_conv below was
# measured in-model NEUTRAL (PERF.md r3): its per-conv abs-max reduce forces
# the f32 conv output to materialize in HBM, costing the bytes the int8 MXU
# saved. The static chain derives activation bounds ANALYTICALLY from the
# (frozen, eval-mode) BatchNorm parameters — post-BN activations distribute
# as mean β, std γ under the running statistics, so |y| <= max_c(|β_c| +
# K·|γ_c|) — which makes every quantize a pure elementwise epilogue that XLA
# fuses into the conv output write. Activations then FLOW as int8 between
# convs (HBM bytes halve vs bf16), dequantizing only at stage boundaries.
# No new state: bounds are derived from existing params, so the checkpoint
# layout is bit-identical to the float path.
# ---------------------------------------------------------------------------

INT8_SIGMA = 6.0  # K in the analytic bound; outliers beyond K·σ saturate


def int8_qkernel(kernel):
    """Per-output-channel symmetric int8 kernel quantization.

    Returns (kq int8, sw (Co,) f32 dequant scales)."""
    kf = kernel.astype(jnp.float32)
    sw = jnp.maximum(jnp.max(jnp.abs(kf), axis=(0, 1, 2)), 1e-12) / 127.0
    kq = jnp.round(kf / sw).astype(jnp.int8)
    return kq, sw


def int8_conv_i32(xq, kq, stride, padding):
    """int8 x int8 NHWC conv accumulated in int32 on the MXU."""
    return jax.lax.conv_general_dilated(
        xq, kq, (stride, stride), padding,
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        preferred_element_type=jnp.int32,
    )


def q8(y, bound, zero=0.0):
    """Quantize f32 y to int8 with zero-point ``zero`` (0 = symmetric signed;
    127 = unsigned-in-signed for post-relu tensors: y ∈ [0, bound] maps to
    [-127, 127], DOUBLING resolution). Pure elementwise — fuses into the
    producer's epilogue. Dequant: (q + zero) · bound/(127 + zero)."""
    s = (127.0 + zero) / jnp.maximum(bound, 1e-8)
    return jnp.clip(jnp.round(y * s) - zero, -127.0, 127.0).astype(jnp.int8)


def deq8(xq, bound, zero=0.0):
    return (xq.astype(jnp.float32) + zero) * (
        jnp.maximum(bound, 1e-8) / (127.0 + zero)
    )


def int8_conv_affine(xc, kq, sw, bias, gt, sh, stride, padding):
    """One chain link: int8 conv + the WHOLE dequant·bias·BN affine as one
    fused elementwise epilogue.

    Zero-point carries (post-relu unsigned-in-signed, zero=127) are handled
    EXACTLY by padding the int8 operand with ``-zero`` instead of 0 — a
    padding cell then satisfies (xq + zero) = 0, i.e. dequantizes to true
    zero, so conv(x)/s_in = conv_valid(pad(xq, -zero)) + zero·Σkq where the
    second term is a per-channel CONSTANT that folds into the affine. No
    border-correction map, one int8 pad copy (half the bytes of a bf16
    activation) per conv.

    xc: (xq int8 NHWC, bound, zero) carry; padding ((a,b),(c,d)) explicit.
    Returns pre-relu f32.
    """
    xq, bnd, zero = xc
    s_in = jnp.maximum(bnd, 1e-8) / (127.0 + zero)
    if zero:
        pv = jnp.asarray(-zero, jnp.int8)
        xq = jax.lax.pad(
            xq, pv,
            [(0, 0, 0), (*padding[0], 0), (*padding[1], 0), (0, 0, 0)])
        y = int8_conv_i32(xq, kq, stride, "VALID").astype(jnp.float32)
        y = y + zero * kq.astype(jnp.float32).sum(axis=(0, 1, 2))
    else:
        y = int8_conv_i32(xq, kq, stride, padding).astype(jnp.float32)
    alpha = s_in * sw * gt
    beta = (0.0 if bias is None else bias) * gt + sh
    return y * alpha + beta


def int8_conv(x, kernel, stride, padding, bias=None, out_dtype=None):
    """Dynamic symmetric int8 quantized NHWC conv (frozen-teacher path).

    Per-tensor activation scale (max|x|/127), per-output-channel weight
    scales; int8 x int8 accumulated in int32 on the MXU — 2x the bf16 peak
    on v5e (measured tools/int8_bench.py: 1.75-1.86x at the teacher's
    stage-1/2 shapes). Dequantizes into f32 and applies the bias there.
    NOT differentiable (round) — callers are stop_gradient'ed teacher
    scopes (pillarnet.py:17-33 freeze semantics). VERDICT r2 next #2.
    """
    xf = x.astype(jnp.float32)
    sx = jnp.maximum(jnp.max(jnp.abs(xf)), 1e-8) / 127.0
    xq = jnp.round(xf / sx).astype(jnp.int8)
    kf = kernel.astype(jnp.float32)
    sw = jnp.maximum(jnp.max(jnp.abs(kf), axis=(0, 1, 2)), 1e-12) / 127.0
    kq = jnp.round(kf / sw).astype(jnp.int8)
    y = jax.lax.conv_general_dilated(
        xq, kq, (stride, stride), padding,
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        preferred_element_type=jnp.int32,
    )
    y = y.astype(jnp.float32) * (sx * sw)
    if bias is not None:
        y = y + bias.astype(jnp.float32)
    return y.astype(out_dtype or x.dtype)


class _ConvParams(nn.Module):
    """Raw conv params under the same scope/names nn.Conv would create
    ('<name>/kernel', '<name>/bias') so int8 and float paths share one
    checkpoint layout."""

    shape: tuple
    features: int
    use_bias: bool
    kernel_init: Callable = conv_kernel_init_torch

    @nn.compact
    def __call__(self):
        k = self.param("kernel", self.kernel_init, self.shape)
        b = (self.param("bias", nn.initializers.zeros, (self.features,))
             if self.use_bias else None)
        return k, b


class Conv2dTorch(nn.Module):
    """NHWC conv with torch-style explicit padding. Kernel layout HWIO."""

    features: int
    kernel_size: int = 3
    stride: int = 1
    padding: int = 0
    use_bias: bool = False
    groups: int = 1
    kernel_init: Callable = conv_kernel_init_torch
    dtype: Dtype | None = None
    int8: bool = False

    @nn.compact
    def __call__(self, x, qpieces: bool = False, raw: bool = False):
        k, p = self.kernel_size, self.padding
        if raw:
            # int8-static chain, strided links: the RAW float kernel so the
            # caller can space-to-depth-pack it before quantizing (x is only
            # used for the input channel count)
            assert self.groups == 1
            return _ConvParams(
                (k, k, x.shape[-1], self.features), self.features,
                self.use_bias, self.kernel_init, name="conv")()
        if qpieces:
            # int8-static chain: quantized kernel + scales (params under the
            # same 'conv' scope as the float/nn.Conv path)
            assert self.groups == 1
            kern, bias = _ConvParams(
                (k, k, x.shape[-1], self.features), self.features,
                self.use_bias, self.kernel_init, name="conv")()
            kq, sw = int8_qkernel(kern)
            return kq, sw, (None if bias is None else bias.astype(jnp.float32))
        if self.int8:
            assert self.groups == 1, "int8 path assumes groups=1"
            kern, bias = _ConvParams(
                (k, k, x.shape[-1], self.features), self.features,
                self.use_bias, self.kernel_init, name="conv")()
            return int8_conv(
                x, kern, self.stride, ((p, p), (p, p)), bias,
                out_dtype=self.dtype or x.dtype)
        # (The WIDE_CONV=1/2 Pallas wide-N conv route dispatched here until
        # r5. BOTH variants lost on hardware in driver-identical benches:
        # WIDE_CONV=1 −27% (r4 autopsy: kernel pipelining + global layout
        # collateral), WIDE_CONV=2 W-paired 10.105 → 7.136 samples/s (−29%,
        # r5) — the route's wiring is deleted per the no-unproven-gated-
        # paths rule; the kernels + exactness tests remain as tombstones in
        # ops/pallas_wide_conv.py / tests/test_wide_conv.py /
        # tests/test_wpair.py.)
        return nn.Conv(
            self.features,
            (k, k),
            strides=(self.stride, self.stride),
            padding=((p, p), (p, p)),
            use_bias=self.use_bias,
            feature_group_count=self.groups,
            kernel_init=self.kernel_init,
            bias_init=nn.initializers.zeros,
            dtype=self.dtype,
            name="conv",
        )(x)


class ConvTranspose2dTorch(nn.Module):
    """torch ConvTranspose2d(k, s, p): out = (in-1)*s - 2p + k. NHWC."""

    features: int
    kernel_size: int
    stride: int
    padding: int = 0
    use_bias: bool = False
    dtype: Dtype | None = None

    @nn.compact
    def __call__(self, x):
        k, s, p = self.kernel_size, self.stride, self.padding
        in_ch = x.shape[-1]
        kernel = self.param(
            "kernel", conv_kernel_init_torch, (k, k, in_ch, self.features)
        )
        # transpose conv == conv with lhs dilation s, padding k-1-p, flipped kernel
        y = jax.lax.conv_general_dilated(
            x.astype(self.dtype or x.dtype),
            jnp.flip(kernel, (0, 1)).astype(self.dtype or kernel.dtype),
            window_strides=(1, 1),
            padding=((k - 1 - p, k - 1 - p), (k - 1 - p, k - 1 - p)),
            lhs_dilation=(s, s),
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
        )
        if self.use_bias:
            bias = self.param("bias", nn.initializers.zeros, (self.features,))
            y = y + bias
        return y


class _BNVars(nn.Module):
    """The exact param/variable tree flax nn.BatchNorm creates (scale=1,
    bias=0, mean=0, var=1) — lets the int8-static chain read eval-BN pieces
    without running the normalization, and the merged-head path
    (center_head.py) read/UPDATE them externally (returns the mutable
    Variable objects for the running stats)."""

    features: int

    @nn.compact
    def __call__(self):
        scale = self.param("scale", nn.initializers.ones, (self.features,))
        bias = self.param("bias", nn.initializers.zeros, (self.features,))
        mean = self.variable(
            "batch_stats", "mean", lambda: jnp.zeros((self.features,)))
        var = self.variable(
            "batch_stats", "var", lambda: jnp.ones((self.features,)))
        return scale, bias, mean, var


class BatchNormTorch(nn.Module):
    """flax BatchNorm with torch momentum convention + train/eval switch."""

    eps: float = BN_EPS_DEFAULT
    momentum: float = BN_MOM_DEFAULT  # torch momentum
    dtype: Dtype | None = None

    @nn.compact
    def __call__(self, x, train: bool, affine: bool = False,
                 pieces: bool = False):
        if pieces:
            # merged-head path (center_head.py): the raw params + MUTABLE
            # running-stat variables, normalization done by the caller over
            # the channel-concatenated hidden (numerically the same BN)
            return _BNVars(x.shape[-1], name="bn")()
        if affine:
            # int8-static chain: eval-mode BN as (γ̃, shift, bound) — same
            # extraction as MaskedBatchNorm.affine (x: channel count only)
            assert not train, "affine extraction is an eval-only path"
            scale, bias, mean_v, var_v = _BNVars(x.shape[-1], name="bn")()
            mean, var = mean_v.value, var_v.value
            gt = jax.lax.rsqrt(var + self.eps) * scale
            shift = bias - mean * gt
            bound = jnp.max(jnp.abs(bias) + INT8_SIGMA * jnp.abs(scale))
            return gt, shift, bound
        return nn.BatchNorm(
            use_running_average=not train,
            momentum=1.0 - self.momentum,
            epsilon=self.eps,
            dtype=self.dtype,
            name="bn",
        )(x)


class MaskedBatchNorm(nn.Module):
    """BatchNorm whose batch statistics are computed over masked elements only.

    x: (..., C); mask: broadcastable to x[..., 0] — 1 for active elements.
    This reproduces the reference's BN1d over the packed active-site feature
    list: inactive (padded / empty-pillar) rows contribute nothing to the
    statistics, and their (garbage) normalized values must be re-masked by
    the caller.
    """

    eps: float = BN_EPS_BACKBONE
    momentum: float = BN_MOM_BACKBONE
    dtype: Dtype | None = None

    @nn.compact
    def __call__(self, x, mask, train: bool, affine: bool = False):
        c = x.shape[-1]
        scale = self.param("scale", nn.initializers.ones, (c,))
        bias = self.param("bias", nn.initializers.zeros, (c,))
        ra_mean = self.variable("batch_stats", "mean", lambda: jnp.zeros((c,)))
        ra_var = self.variable("batch_stats", "var", lambda: jnp.ones((c,)))

        if affine:
            # int8-static chain: the eval-mode BN as (γ̃, shift, bound) —
            # y = γ̃·x + shift; post-BN activations bound by max(|β| + K·|γ|)
            # (x is only used for the channel count)
            assert not train, "affine extraction is an eval-only (frozen) path"
            gt = jax.lax.rsqrt(ra_var.value + self.eps) * scale
            shift = bias - ra_mean.value * gt
            bound = jnp.max(jnp.abs(bias) + INT8_SIGMA * jnp.abs(scale))
            return gt, shift, bound

        if train:
            # single-pass statistics (Σx, Σx²) — one fewer full-tensor
            # traversal than the (x-mean)² form. Multiplies stay in the
            # compute dtype; the REDUCE accumulates f32 (dtype=) so no f32
            # copy of the full map is materialized (PERF.md profile).
            m = mask.astype(x.dtype)[..., None]
            n = jnp.clip(jnp.sum(mask.astype(jnp.float32)), 1.0)
            axes = tuple(range(x.ndim - 1))
            xm = x * m
            s1 = jnp.sum(xm, axis=axes, dtype=jnp.float32)
            s2 = jnp.sum(xm * x, axis=axes, dtype=jnp.float32)
            mean = s1 / n
            var = jnp.maximum(s2 / n - mean * mean, 0.0)
            if not self.is_initializing():
                # torch updates running_var with the *unbiased* batch variance
                unbiased = var * n / jnp.clip(n - 1.0, 1.0)
                ra_mean.value = (1 - self.momentum) * ra_mean.value + self.momentum * mean
                ra_var.value = (1 - self.momentum) * ra_var.value + self.momentum * unbiased
        else:
            mean, var = ra_mean.value, ra_var.value

        y = (x - mean) * jax.lax.rsqrt(var + self.eps) * scale + bias
        return y.astype(self.dtype or x.dtype)


class LayerNormTorch(nn.Module):
    """Channels-last LayerNorm, eps 1e-6 (ConvNeXt; Basicblock_convn.py:58-76)."""

    eps: float = 1e-6

    @nn.compact
    def __call__(self, x):
        return nn.LayerNorm(epsilon=self.eps, name="ln")(x)


class GRN(nn.Module):
    """Global Response Normalization (ConvNeXt-v2; Basicblock_convn.py:84-95).

    x: (B, H, W, C): Gx = ||x||_2 over (H, W); Nx = Gx / (mean_c Gx + eps);
    out = gamma * x * Nx + beta + x. gamma/beta init 0.
    """

    @nn.compact
    def __call__(self, x):
        c = x.shape[-1]
        gamma = self.param("gamma", nn.initializers.zeros, (1, 1, 1, c))
        beta = self.param("beta", nn.initializers.zeros, (1, 1, 1, c))
        gx = jnp.sqrt(jnp.sum(jnp.square(x.astype(jnp.float32)), axis=(1, 2), keepdims=True))
        nx = gx / (jnp.mean(gx, axis=-1, keepdims=True) + 1e-6)
        return (gamma * (x * nx.astype(x.dtype)) + beta + x).astype(x.dtype)


def max_pool_mask(mask: jnp.ndarray, kernel: int = 3, stride: int = 2, padding: int = 1):
    """Dilate an occupancy mask the way a strided SparseConv2d grows the
    active set: output site active iff any input site in its kxk receptive
    field is active. mask: (B, H, W) float/bool -> (B, H', W') same dtype."""
    m = mask.astype(jnp.float32)[..., None]
    y = jax.lax.reduce_window(
        m,
        -jnp.inf,
        jax.lax.max,
        (1, kernel, kernel, 1),
        (1, stride, stride, 1),
        ((0, 0), (padding, padding), (padding, padding), (0, 0)),
    )
    return (y[..., 0] > 0).astype(mask.dtype)


def clip_sigmoid(x, eps=1e-4):
    """radar_distill_final.py:12-26 / center_head sigmoid clamp."""
    return jnp.clip(jax.nn.sigmoid(x), eps, 1 - eps)
