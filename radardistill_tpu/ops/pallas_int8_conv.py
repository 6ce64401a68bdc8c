"""Fused int8 3x3 conv chain — the frozen-teacher static-int8 kernel.

Why this exists (PERF.md r3 "int8 static chain" profile): expressed in XLA,
the int8 chain is SLOWER than bf16 — the conv materializes its int32 output
to HBM and the dequant·BN·relu·quant epilogue runs as a separate
bandwidth-bound kernel, tripling the traffic the int8 MXU was supposed to
save. This kernel keeps the whole link in VMEM: int8 activations in, 3
ky-stacked int8 MXU matmuls (N = 3·Co — throughput tracks output lanes;
tools/pallas_conv_proto.py: int8 N=128 59 TF/s, N=512 132 TF/s vs the 37
TF/s bf16 conv wall), int32 accumulation via aligned row/lane slices, and
the ENTIRE epilogue (dequant affine + optional residual + relu + mask +
requant) fused on the accumulator before one int8 write.

Layout: output row y needs padded input rows y..y+2 (input is H-padded by
one row of ``zpad`` each side, where zpad = -zero_point dequantizes to an
exact 0). Per kx ∈ {-1,0,1} the W-shift is a VMEM concat with a zpad
column; the 3 ky taps stack into ONE (C, 3·Co) operand so the tap sum is
P[ky·W : ky·W + BH·W, ky·Co:(ky+1)·Co] summed over ky — row offsets are
multiples of W (sublane-aligned), lane offsets multiples of Co (aligned).

Teacher-freeze semantics: forward-only (reference
pcdet/models/detectors/pillarnet.py:17-33 — the teacher branch is frozen);
no VJP is defined, the teacher subgraph is pruned from the backward by
stop_gradient.

Exact relationship to the XLA formulation (models/layers.py
int8_conv_affine): same integer conv, same f32 epilogue ordering —
equivalence asserted in tests/test_int8.py (interpret mode).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

BH = 8  # output rows per program


def pack_taps(kq):
    """(3,3,C,Co) int8 conv kernel -> (3_kx, C, 3_ky*Co) stacked operand."""
    return jnp.transpose(kq, (1, 2, 0, 3)).reshape(
        kq.shape[1], kq.shape[2], 3 * kq.shape[3])


def _chain_kernel(x_hbm, k_ref, ab_ref, mask_ref, *refs, w, c, co, zpad,
                  has_res):
    if has_res:
        res_ref, out_ref, xbuf, sem = refs
    else:
        (out_ref, xbuf, sem), res_ref = refs, None
    b = pl.program_id(0)
    i = pl.program_id(1)
    cp = pltpu.make_async_copy(x_hbm.at[b, pl.ds(i * BH, BH + 2)], xbuf, sem)
    cp.start()
    cp.wait()
    x = xbuf[:]  # (BH+2, w, c) int8; H-pad rows already hold zpad
    pcol = jnp.full((BH + 2, 1, c), zpad, jnp.int8)
    flats = (
        jnp.concatenate([pcol, x[:, :-1]], axis=1),   # kx=-1 column
        x,
        jnp.concatenate([x[:, 1:], pcol], axis=1),    # kx=+1 column
    )
    acc = jnp.zeros((BH * w, co), jnp.int32)
    for kx in range(3):
        p = jax.lax.dot_general(
            flats[kx].reshape((BH + 2) * w, c), k_ref[kx],
            (((1,), (0,)), ((), ())), preferred_element_type=jnp.int32)
        for ky in range(3):
            acc += p[ky * w:ky * w + BH * w, ky * co:(ky + 1) * co]
    alpha = ab_ref[0][None, :]
    beta = ab_ref[1][None, :]
    y = acc.astype(jnp.float32) * alpha + beta
    if res_ref is not None:
        rs = ab_ref[3][0]
        rsh = ab_ref[4][0]
        y = y + (res_ref[0].reshape(BH * w, co).astype(jnp.float32) * rs + rsh)
    y = jnp.maximum(y, 0.0)
    y = y * mask_ref[0].reshape(BH * w, co).astype(jnp.float32)
    s_out = ab_ref[2][0]
    q = jnp.clip(jnp.round(y * s_out) - 127.0, -127.0, 127.0)
    out_ref[:] = q.reshape(1, BH, w, co).astype(jnp.int8)


@functools.partial(jax.jit, static_argnames=("zpad", "interpret"))
def _chain_call(xp, k9, ab, mask_q, resq, zpad, interpret=False):
    bsz, hp, w, c = xp.shape
    h = hp - 2
    co = k9.shape[-1] // 3
    assert h % BH == 0, (h, BH)
    ins = [xp, k9, ab, mask_q] + ([resq] if resq is not None else [])
    in_specs = [
        pl.BlockSpec(memory_space=pl.ANY),
        pl.BlockSpec((3, c, 3 * co), lambda b, i: (0, 0, 0)),
        pl.BlockSpec((8, co), lambda b, i: (0, 0)),
        pl.BlockSpec((1, BH, w, co), lambda b, i: (b, i, 0, 0)),
    ]
    if resq is not None:
        in_specs.append(pl.BlockSpec((1, BH, w, co), lambda b, i: (b, i, 0, 0)))
    return pl.pallas_call(
        functools.partial(_chain_kernel, w=w, c=c, co=co, zpad=zpad,
                          has_res=resq is not None),
        grid=(bsz, h // BH),
        in_specs=in_specs,
        out_specs=pl.BlockSpec((1, BH, w, co), lambda b, i: (b, i, 0, 0)),
        out_shape=jax.ShapeDtypeStruct((bsz, h, w, co), jnp.int8),
        scratch_shapes=[
            pltpu.VMEM((BH + 2, w, c), jnp.int8),
            pltpu.SemaphoreType.DMA,
        ],
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024),
        interpret=interpret,
    )(*ins)


def int8_block_conv(xc, kq, sw, bias, gt, sh, bound, mask_q, res=None):
    """One fused chain link: int8 3x3 s1 conv + dequant·BN affine
    (+ residual add) + relu + mask + requant, returning the next int8 carry.

    xc/res: (xq int8 NHWC, bound, zero) carries; kq/sw from int8_qkernel;
    gt/sh from the BN affine extraction; bound: the BN analytic activation
    bound for THIS conv's output (the residual carry bound is added for the
    post-add range); mask_q: (B,H,W,Co) int8 0/1 lane-expanded mask.
    Returns (q int8, b_out, 127.0). Non-TPU platforms run the kernel in
    interpret mode (CPU tests); same math as the XLA formulation
    (models/layers.py int8_conv_affine + q8).
    """
    xq, bnd, zero = xc
    co = kq.shape[-1]
    s_in = jnp.maximum(bnd, 1e-8) / (127.0 + zero)
    alpha = (s_in * sw * gt).astype(jnp.float32)
    # conv(x)/s_in = conv_valid(pad(xq, -zero)) + zero·Σkq (per-channel
    # constant — the zero-point term folds into beta; same identity as
    # layers.int8_conv_affine)
    ksum = kq.astype(jnp.float32).sum(axis=(0, 1, 2))
    bias_t = 0.0 if bias is None else bias
    beta = (zero * ksum * alpha + bias_t * gt + sh).astype(jnp.float32)

    zpad = -int(zero)  # python float in this chain: 0.0 entry, 127.0 after
    xp = jax.lax.pad(
        xq, jnp.asarray(zpad, jnp.int8),
        [(0, 0, 0), (1, 1, 0), (0, 0, 0), (0, 0, 0)])
    k9 = pack_taps(kq)

    if res is not None:
        resq, rb, rz = res
        rs = jnp.maximum(rb, 1e-8) / (127.0 + rz)
        b_out = bound + rb
    else:
        resq, b_out = None, bound
    s_out = 254.0 / jnp.maximum(b_out, 1e-8)

    ab = jnp.zeros((8, co), jnp.float32)
    ab = ab.at[0].set(alpha)
    ab = ab.at[1].set(beta)
    ab = ab.at[2].set(s_out)
    if res is not None:
        ab = ab.at[3].set(rs)
        ab = ab.at[4].set(rz * rs)

    interpret = jax.devices()[0].platform != "tpu"
    # frozen-teacher only: sever tangents BEFORE the kernel — pallas_call
    # has no JVP rule, and under value_and_grad the teacher params still
    # carry (optax-masked) tangents into this subgraph
    xp, k9, ab, mask_q, resq = jax.lax.stop_gradient(
        (xp, k9, ab, mask_q, resq))
    q = _chain_call(xp, k9, ab, mask_q, resq, zpad, interpret=interpret)
    return q, jax.lax.stop_gradient(b_out), 127.0
