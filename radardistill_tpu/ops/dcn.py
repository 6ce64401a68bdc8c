"""Modulated deformable convolution (DCNv2) as bilinear gather + MXU matmul.

TPU-native replacement for the reference's CUDA extension
(reference: pcdet/ops/basicblock/src/cuda/modulated_deform_im2col_cuda.cuh —
per-thread bilinear im2col; autograd wrapper
pcdet/ops/basicblock/functions/modulated_deform_conv_func.py:15-56; used by
the CMA downsample, pcdet/ops/basicblock/modules/Basicblock_convn.py:29-44).

Formulation: for output site p and kernel tap k, sample the input at
``p*stride - pad + k + Δ_k(p)`` with bilinear interpolation (zeros outside),
scale by the modulation mask m_k(p), then contract the (9·Cin) sampled vector
with the (9·Cin, Cout) weight — one big batched matmul instead of im2col
scratch memory. Gathers are expressed as jnp.take on flattened H*W so XLA
lowers them to efficient dynamic-gathers; the backward pass (scatter-add)
falls out of autodiff.

Offset channel convention matches the CUDA kernel: channel 2k is Δy of tap k,
channel 2k+1 is Δx (taps in row-major (ki, kj) order).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def _bilinear_gather(x_flat, h, w, H, W):
    """x_flat: (HW, C); h, w: (...,) float coords. Zero outside. -> (..., C)."""
    h0 = jnp.floor(h)
    w0 = jnp.floor(w)
    dh = h - h0
    dw = w - w0

    out = 0.0
    for (hi, wi, wt) in (
        (h0, w0, (1 - dh) * (1 - dw)),
        (h0, w0 + 1, (1 - dh) * dw),
        (h0 + 1, w0, dh * (1 - dw)),
        (h0 + 1, w0 + 1, dh * dw),
    ):
        ok = (hi >= 0) & (hi < H) & (wi >= 0) & (wi < W)
        idx = jnp.clip(hi, 0, H - 1).astype(jnp.int32) * W + jnp.clip(wi, 0, W - 1).astype(jnp.int32)
        vals = jnp.take(x_flat, idx.reshape(-1), axis=0).reshape(idx.shape + (x_flat.shape[-1],))
        out = out + vals * (wt * ok)[..., None].astype(x_flat.dtype)
    return out


def modulated_deform_conv(
    x: jnp.ndarray,
    offset: jnp.ndarray,
    mask: jnp.ndarray,
    weight: jnp.ndarray,
    stride: int = 1,
    padding: int = 1,
    kernel_size: int = 3,
) -> jnp.ndarray:
    """DCNv2 forward.

    Args:
        x: (B, H, W, Cin) NHWC input.
        offset: (B, Ho, Wo, 2*K²) — [Δy_k, Δx_k] interleaved per tap.
        mask: (B, Ho, Wo, K²) — modulation scalars (already sigmoided).
        weight: (K, K, Cin, Cout) HWIO.
        stride, padding, kernel_size: conv geometry (deformable_groups=1).
    Returns:
        (B, Ho, Wo, Cout).
    """
    B, H, W, Cin = x.shape
    K = kernel_size
    Ho, Wo = offset.shape[1], offset.shape[2]

    # base sampling grid per tap
    ho = jnp.arange(Ho, dtype=x.dtype)
    wo = jnp.arange(Wo, dtype=x.dtype)
    ki = jnp.arange(K, dtype=x.dtype)
    base_h = (ho[:, None] * stride - padding)[..., None, None] + ki[None, None, :, None]  # (Ho,1,K,1)
    base_w = (wo[None, :] * stride - padding)[..., None, None] + ki[None, None, None, :]  # (1,Wo,K,K)
    base_h = jnp.broadcast_to(base_h, (Ho, Wo, K, K)).reshape(Ho, Wo, K * K)
    base_w = jnp.broadcast_to(base_w, (Ho, Wo, K, K)).reshape(Ho, Wo, K * K)

    off = offset.reshape(B, Ho, Wo, K * K, 2)
    h = base_h[None] + off[..., 0]
    w = base_w[None] + off[..., 1]

    def sample_one(xf, hh, ww, mm):
        s = _bilinear_gather(xf, hh, ww, H, W)  # (Ho, Wo, K², Cin)
        return s * mm[..., None]

    x_flat = x.reshape(B, H * W, Cin)
    sampled = jax.vmap(sample_one)(x_flat, h, w, mask)  # (B, Ho, Wo, K², Cin)

    w_mat = weight.transpose(0, 1, 2, 3).reshape(K * K * Cin, -1)
    y = sampled.reshape(B, Ho, Wo, K * K * Cin) @ w_mat.astype(sampled.dtype)
    return y


def plain_conv_weights_tap_order(weight):
    """Identity helper documenting that tap order is row-major (ki, kj) —
    the same as HWIO reshape order, so a zero-offset, unit-mask DCN equals a
    plain conv with the same HWIO weights (tested in tests/test_dcn.py,
    mirroring the reference's check_mdconv_zero_offset harness,
    pcdet/ops/basicblock/test.py:36-60)."""
    return weight
