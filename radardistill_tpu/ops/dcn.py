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

import os

import jax
import jax.numpy as jnp

def dcn_max_offset() -> int:
    """Production offset clamp of the Pallas MXU kernels (cells;
    ±R·stride·voxel in meters — R=5 at stride 8 is ±3 m). The reference's
    CUDA offsets are UNBOUNDED (modulated_deform_im2col_cuda.cuh) — R is a
    window/FLOP budget, justified by telemetry: models/distill.py sows the
    per-step fraction of |offset| > R as tb `dcn_offset_sat` (VERDICT r3
    #5); persistently nonzero saturation means R must be raised. DCN_R env
    knob for A/B — read at TRACE time so one process can build both legs
    (tools/quality_gate.py)."""
    return int(os.environ.get("DCN_R", "5"))


@jax.custom_vjp
def _permute_rows(x, perm, inv_perm):
    """y[i] = x[perm[i]] with a VJP that is ALSO a gather (g[inv_perm])
    instead of the permutation scatter autodiff would emit."""
    return x[perm]


def _permute_rows_fwd(x, perm, inv_perm):
    return x[perm], inv_perm


def _permute_rows_bwd(inv_perm, g):
    return g[inv_perm], None, None


_permute_rows.defvjp(_permute_rows_fwd, _permute_rows_bwd)


@jax.custom_vjp
def _gather_sorted_rows(x, idx):
    """Monotone row gather whose VJP scatter-add DROPS the sorted hint.

    The autodiff transpose of a sorted-hint gather is a sorted-hint
    scatter-add; idx here is monotone-with-DUPLICATES (cummax hole-fill +
    edge clipping), and that scatter-add MIS-EXECUTES on real TPU at some
    shapes (r5 tools/dcn_smoke.py: dx rel err 0.99 at the 90² CMA site,
    exact at 180² — interpret/CPU both fine, production unaffected because
    the Pallas kernels own the TPU path). The forward gather keeps the
    hint (gathers tolerate duplicates); the backward scatters unhinted."""
    return x.at[idx].get(mode="clip", indices_are_sorted=True)


def _gsr_fwd(x, idx):
    return _gather_sorted_rows(x, idx), (idx, x.shape)


def _gsr_bwd(res, g):
    idx, shape = res
    return (
        jnp.zeros(shape, g.dtype).at[jnp.clip(idx, 0, shape[0] - 1)].add(g),
        None,
    )


_gather_sorted_rows.defvjp(_gsr_fwd, _gsr_bwd)


def _bilinear_gather(x_flat, h, w, H, W):
    """x_flat: (HW, C); h, w: (...,) float coords. Zero outside. -> (..., C).

    Sorted-domain formulation: one argsort of the base-cell index makes all
    four corner gathers monotone (corner offsets preserve order; boundary
    saturations are hole-filled with a cummax and zeroed by the weight), so
    the gathers AND their VJP scatter-adds carry `indices_are_sorted=True`
    — jax propagates the flag through the gather transpose. The unsorted
    scatter-adds of the plain formulation ran at ~26 GB/s (46 ms/step of
    DCN backward at bs4, r2 profile)."""
    shape = h.shape
    c = x_flat.shape[-1]
    hf = h.reshape(-1)
    wf = w.reshape(-1)
    h0f = jnp.floor(hf)
    w0f = jnp.floor(wf)
    # lexicographic key on the TRUE base cell clipped to the one-cell halo
    # [-1, H-1]: every corner's in-range indices are then monotone in sort
    # order (a clipped/per-corner key interleaves boundary rows and breaks
    # it — and a violated sorted-gather hint returns wrong values on TPU).
    # Fully-out-of-range rows merge under the clip; they are weight-masked
    # and hole-filled below, so their position is irrelevant.
    key = (jnp.clip(h0f, -1, H - 1) + 1).astype(jnp.int32) * (W + 1) + (
        jnp.clip(w0f, -1, W - 1) + 1
    ).astype(jnp.int32)
    order = jnp.argsort(key)
    inv_order = jnp.argsort(order)
    # ONE packed permute (row ops pay ~10-20 ns/row regardless of width;
    # two scalar permutes cost twice what one 2-col permute does)
    hw_s = _permute_rows(jnp.stack([hf, wf], axis=-1), order, inv_order)
    hs = hw_s[:, 0]
    ws = hw_s[:, 1]
    h0 = jnp.floor(hs)
    w0 = jnp.floor(ws)
    dh = hs - h0
    dw = ws - w0

    out = jnp.zeros((hs.shape[0], c), x_flat.dtype)
    for (hi, wi, wt) in (
        (h0, w0, (1 - dh) * (1 - dw)),
        (h0, w0 + 1, (1 - dh) * dw),
        (h0 + 1, w0, dh * (1 - dw)),
        (h0 + 1, w0 + 1, dh * dw),
    ):
        ok = (hi >= 0) & (hi < H) & (wi >= 0) & (wi < W)
        idx = (
            jnp.clip(hi, 0, H - 1).astype(jnp.int32) * W
            + jnp.clip(wi, 0, W - 1).astype(jnp.int32)
        )
        # clip saturation at the grid edge can locally break monotonicity;
        # those entries are weight-masked to zero, so fill the holes forward
        idx_mono = jnp.clip(jax.lax.cummax(jnp.where(ok, idx, -1)), 0, H * W - 1)
        vals = _gather_sorted_rows(x_flat, idx_mono)
        out = out + vals * (wt * ok)[..., None].astype(x_flat.dtype)
    return _permute_rows(out, inv_order, order).reshape(shape + (c,))


def modulated_deform_conv(
    x: jnp.ndarray,
    offset: jnp.ndarray,
    mask: jnp.ndarray,
    weight: jnp.ndarray,
    stride: int = 1,
    padding: int = 1,
    kernel_size: int = 3,
) -> jnp.ndarray:
    """DCNv2 dispatcher: Pallas MXU kernels on TPU (fwd + full custom bwd,
    offsets clamped to ±5 cells — ops/pallas_dcn.py, where R also sets the
    kernels' window/FLOP cost), XLA sorted-domain gather formulation
    elsewhere / for unsupported shapes. DCN_PALLAS=0 disables the kernel
    path for A/B measurement."""
    import os

    from .pallas_dcn import modulated_deform_conv_mxu, shapes_supported

    if (
        os.environ.get("DCN_PALLAS", "1") != "0"
        and jax.devices()[0].platform == "tpu"
        and shapes_supported(x.shape, offset.shape, stride, padding, kernel_size)
    ):
        return modulated_deform_conv_mxu(
            x, offset, mask, weight, stride, padding,
            max_offset=dcn_max_offset())
    return _modulated_deform_conv_xla(
        x, offset, mask, weight, stride, padding, kernel_size
    )


def _modulated_deform_conv_xla(
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
