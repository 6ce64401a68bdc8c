"""Trainable wide-N 3x3 conv: ky-stacked Pallas MXU matmuls + custom VJP.

XLA lowers a 3x3 NHWC conv to implicit-GEMM dots whose output lane count is
Co — and v5e MXU throughput tracks output lanes (tools/mxu_rate.py: N=128 ->
37.9 TF/s, N=256 -> 62.5, N=512+ -> 95+). The BEV-neck / dense-stage convs
of both branches sit at Co=256, i.e. the 62 TF/s wall, for ~1.6 TF of the
11.8 TF step.

This kernel computes the same conv as ONE ky-stacked dot per kx shift
(N = 3*Co lanes, the proven recipe of ops/pallas_int8_conv.py /
pallas_conv_block.py) with the ky-tap sum performed on the VMEM accumulator
— so HBM traffic stays identical to the XLA conv (read x + halo, write y)
while the MXU runs at the N=768+ rate. A pure-XLA reformulation was costed
out: materializing the (B,H,W,3Co) per-ky contribution tensor adds ~2x the
conv's own bandwidth and eats the MXU win.

Unlike the frozen-teacher chain kernels (no JVP rule, tangents severed by
the caller), this one is TRAINABLE: full custom VJP where

- dX is itself a 3x3 stride-1 conv of dy with the spatially-flipped,
  in/out-transposed kernel -> the SAME Pallas kernel at N = 3*Ci;
- dW is the standard batch<->feature-swapped XLA conv (what XLA's own
  autodiff emits for conv_general_dilated) — it is a large-K dot and was
  never the wall.

Scope: kernel 3x3, stride 1, padding 1, groups 1, no bias (the call sites
are conv+BN stacks — BN/ReLU stay in XLA; at the neck's 180^2/90^2 sizes
they are bandwidth-trivial). Lane dims are padded to 128-multiples for
Mosaic's manual-DMA alignment; intended call sites (Ci, Co >= 128) pay no
pad. Reference semantics: the conv stacks of
pcdet/models/backbones_2d/base_bev_backbone.py:222-283.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .pallas_int8_conv import pack_taps


def _interpret():
    return jax.devices()[0].platform != "tpu"


def _pick_bh(h):
    for b in (8, 4, 2, 1):
        if h % b == 0 and b + 2 <= h:
            return b
    raise ValueError(f"H={h} too small")


def _wide_kernel(x_hbm, k_ref, out_ref, xbuf, sems, *, h, w, c, cp_, bh):
    """One (bh, w, cp_) output block: clamped halo DMA + 3 kx-shifted dots
    against the (3, c, 3*cp_) ky-stacked kernel, tap sum on the f32 VMEM
    accumulator (structure shared with pallas_conv_block._block_kernel)."""
    b = pl.program_id(0)
    i = pl.program_id(1)
    n_i = pl.num_programs(1)
    dt_x = xbuf.dtype
    rows = bh + 2

    r0 = jnp.clip(i * bh - 1, 0, h - rows)
    cp_in = pltpu.make_async_copy(x_hbm.at[b, pl.ds(r0, rows)], xbuf,
                                  sems.at[0])
    cp_in.start()
    cp_in.wait()

    @pl.when(i == 0)
    def _():
        # buffer holds rows 0..rows-1; want -1..rows-2: shift down, zero top
        shifted = xbuf[0:rows - 1]
        xbuf[1:rows] = shifted
        xbuf[0:1] = jnp.zeros((1, w, c), dt_x)

    @pl.when((i == n_i - 1) & (i > 0))
    def _():
        # buffer holds rows h-rows..h-1; want h-rows+1..h: shift up, zero bot
        shifted = xbuf[1:rows]
        xbuf[0:rows - 1] = shifted
        xbuf[rows - 1:rows] = jnp.zeros((1, w, c), dt_x)

    x = xbuf[:]  # (bh+2, w, c)
    pcol = jnp.zeros((rows, 1, c), dt_x)
    flats = (
        jnp.concatenate([pcol, x[:, :-1]], axis=1),   # kx=-1 column
        x,
        jnp.concatenate([x[:, 1:], pcol], axis=1),    # kx=+1 column
    )
    acc = jnp.zeros((bh * w, cp_), jnp.float32)
    for kx in range(3):
        p = jax.lax.dot_general(
            flats[kx].reshape(rows * w, c), k_ref[kx],
            (((1,), (0,)), ((), ())), preferred_element_type=jnp.float32)
        for ky in range(3):
            acc += p[ky * w:ky * w + bh * w, ky * cp_:(ky + 1) * cp_]
    out_ref[:] = acc.reshape(1, bh, w, cp_).astype(out_ref.dtype)


@functools.partial(jax.jit, static_argnames=("bh", "interpret"))
def _wide_call(x, k9, bh, interpret=False):
    bsz, h, w, c = x.shape
    cp_ = k9.shape[-1] // 3
    assert h % bh == 0 and (bh * w) % 8 == 0 and w % 8 == 0, (h, w, bh)
    return pl.pallas_call(
        functools.partial(_wide_kernel, h=h, w=w, c=c, cp_=cp_, bh=bh),
        grid=(bsz, h // bh),
        in_specs=[
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec((3, c, 3 * cp_), lambda b, i: (0, 0, 0)),
        ],
        out_specs=pl.BlockSpec((1, bh, w, cp_), lambda b, i: (b, i, 0, 0)),
        out_shape=jax.ShapeDtypeStruct((bsz, h, w, cp_), x.dtype),
        scratch_shapes=[
            pltpu.VMEM((bh + 2, w, c), x.dtype),
            pltpu.SemaphoreType.DMA((3,)),
        ],
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024),
        interpret=interpret,
    )(x, k9)


def _wpair(kernel):
    """(3,3,C,Co) stride-1 kernel -> (3,3,2C,2Co) on the W-PAIRED layout
    ((B,H,W,C) -> (B,H,W/2,2C), a free contiguous reshape; lane index =
    (w%2)*C + c). Valid taps: orig dx = 2Δu + p − q ∈ {−1,0,1} (input
    phase p, output phase q) — 6 of 12 slots, i.e. 50% structural zeros.
    Same algebra as models/backbone_s2d.wpair_kernel (kept ops-local to
    avoid an ops→models import; asserted equal in tests/test_wide_conv.py)."""
    _, kw, ci, co = kernel.shape
    assert kw == 3
    kp = jnp.zeros((3, 3, 2 * ci, 2 * co), kernel.dtype)
    for du in (-1, 0, 1):
        for p in range(2):
            for q in range(2):
                dx = 2 * du + p - q
                if abs(dx) > 1:
                    continue
                kp = kp.at[:, du + 1, p * ci:(p + 1) * ci,
                           q * co:(q + 1) * co].set(kernel[:, dx + 1])
    return kp


def _conv_fwd_raw(x, kernel):
    """Padding/packing wrapper around the kernel. x (B,H,W,Ci) bf16/f32,
    kernel (3,3,Ci,Co) float params. Returns (B,H,W,Co) in x.dtype.

    C=64 operands route through the W-PAIRED layout: K=2C=128 and
    N=3·2Co=384 exactly lane-aligned at 2x structural-zero FLOPs — the
    straight C=64 form would pay a 2x K-pad AND 2x N-pad MXU tax (4x
    wasted FLOPs; the measured FP_STAGES loss, PERF.md r4)."""
    bsz, h, w, c = x.shape
    co = kernel.shape[-1]
    if c % 128 and (2 * c) % 128 == 0 and w % 2 == 0:
        y = _conv_unpaired(x.reshape(bsz, h, w // 2, 2 * c), _wpair(kernel))
        return y.reshape(bsz, h, w, co)
    return _conv_unpaired(x, kernel)


def _conv_unpaired(x, kernel):
    _, h, w, c = x.shape
    co = kernel.shape[-1]
    dt = x.dtype
    if c % 128:
        cpad = -(-c // 128) * 128 - c
        x = jnp.pad(x, ((0, 0), (0, 0), (0, 0), (0, cpad)))
        kernel = jnp.pad(kernel, ((0, 0), (0, 0), (0, cpad), (0, 0)))
    cp = co if co % 128 == 0 else -(-co // 128) * 128
    # sublane tile is 16 for bf16 (8 for f32); 16 satisfies both
    dw = (-w) % 16
    if dw:
        x = jnp.pad(x, ((0, 0), (0, 0), (0, dw), (0, 0)))
    k9 = pack_taps(kernel.astype(dt), cp)
    y = _wide_call(x, k9, _pick_bh(h), interpret=_interpret())
    if dw:
        y = y[:, :, :w]
    if cp != co:
        y = y[..., :co]
    return y


@jax.custom_vjp
def conv3x3_wide(x, kernel):
    """3x3 stride-1 pad-1 NHWC conv == lax.conv_general_dilated(...) at the
    operands' dtype resolution, computed at the N=3*Co MXU rate."""
    return _conv_fwd_raw(x, kernel)


def _vjp_fwd(x, kernel):
    return _conv_fwd_raw(x, kernel), (x, kernel)


def _vjp_bwd(resid, dy):
    x, kernel = resid
    # dX: 3x3 stride-1 conv of dy with the flipped, in/out-transposed kernel
    k_t = jnp.transpose(kernel[::-1, ::-1], (0, 1, 3, 2))  # (3,3,Co,Ci)
    dx = _conv_fwd_raw(dy, k_t).astype(x.dtype)
    # dW: batch<->feature-swapped conv (XLA's own conv-autodiff form — a
    # large-K dot, not lane-walled): out (Ci, 3, 3, Co)
    dw = jax.lax.conv_general_dilated(
        jnp.transpose(x, (3, 1, 2, 0)),   # (Ci, H, W, B)
        jnp.transpose(dy, (1, 2, 0, 3)),  # (H, W, B, Co)
        window_strides=(1, 1), padding=((1, 1), (1, 1)),
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        preferred_element_type=jnp.float32,
    )
    dw = jnp.transpose(dw, (1, 2, 0, 3)).astype(kernel.dtype)
    return dx, dw


conv3x3_wide.defvjp(_vjp_fwd, _vjp_bwd)
