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

BH = 8  # default output rows per program (H must be divisible by it)


def pick_bh(h):
    """Largest output-row block in {8,4,2,1} dividing H (stage 4 is 180-row,
    stage 5 90-row — not multiples of 8)."""
    for bh in (8, 4, 2, 1):
        if h % bh == 0:
            return bh
    return 1


def pack_taps(kq, co_pad=None):
    """(kh,kw,C,Co) int8 conv kernel -> (kh_kx, C, kh_ky*co_pad) stacked
    operand. kh==kw in {2,3}. co_pad (default Co) lane-pads each ky block so
    the accumulator's per-tap lane slices stay 128-aligned (stage-2's Co=64)."""
    kh, kw, c, co = kq.shape
    assert kh == kw and kh in (2, 3), (kh, kw)
    k = jnp.transpose(kq, (1, 2, 0, 3))  # (kx, C, ky, Co)
    if co_pad is not None and co_pad != co:
        k = jnp.pad(k, ((0, 0), (0, 0), (0, 0), (0, co_pad - co)))
    return k.reshape(kh, c, kh * (co_pad or co))


def _chain_kernel(x_hbm, k_ref, ab_ref, mask_ref, *refs, w, c, co, cp_, zpad,
                  has_res, kh, bh):
    if has_res:
        res_ref, out_ref, xbuf, sem = refs
    else:
        (out_ref, xbuf, sem), res_ref = refs, None
    b = pl.program_id(0)
    i = pl.program_id(1)
    cp = pltpu.make_async_copy(
        x_hbm.at[b, pl.ds(i * bh, bh + kh - 1)], xbuf, sem)
    cp.start()
    cp.wait()
    x = xbuf[:]  # (bh+kh-1, w, c) int8; H-pad rows already hold zpad
    pcol = jnp.full((bh + kh - 1, 1, c), zpad, jnp.int8)
    if kh == 3:
        flats = (
            jnp.concatenate([pcol, x[:, :-1]], axis=1),   # kx=-1 column
            x,
            jnp.concatenate([x[:, 1:], pcol], axis=1),    # kx=+1 column
        )
    else:  # kh == 2: taps kx in {-1, 0} (packed-grid padding (1,0))
        flats = (jnp.concatenate([pcol, x[:, :-1]], axis=1), x)
    acc = jnp.zeros((bh * w, cp_), jnp.int32)
    for kx in range(kh):
        p = jax.lax.dot_general(
            flats[kx].reshape((bh + kh - 1) * w, c), k_ref[kx],
            (((1,), (0,)), ((), ())), preferred_element_type=jnp.int32)
        for ky in range(kh):
            acc += p[ky * w:ky * w + bh * w, ky * cp_:(ky + 1) * cp_]
    if cp_ != co:
        acc = acc[:, :co]
    alpha = ab_ref[0][None, :]
    beta = ab_ref[1][None, :]
    y = acc.astype(jnp.float32) * alpha + beta
    if res_ref is not None:
        rs = ab_ref[3][0]
        rsh = ab_ref[4][0]
        y = y + (res_ref[0].reshape(bh * w, co).astype(jnp.float32) * rs + rsh)
    y = jnp.maximum(y, 0.0)
    y = y * mask_ref[0].reshape(bh * w, co).astype(jnp.float32)
    s_out = ab_ref[2][0]
    q = jnp.clip(jnp.round(y * s_out) - 127.0, -127.0, 127.0)
    out_ref[:] = q.reshape(1, bh, w, co).astype(jnp.int8)


@functools.partial(
    jax.jit, static_argnames=("zpad", "kh", "bh", "interpret"))
def _chain_call(xp, k9, ab, mask_q, resq, zpad, kh=3, bh=BH, interpret=False):
    bsz, hp, w, c = xp.shape
    h = hp - (kh - 1)
    cp_ = k9.shape[-1] // kh          # lane-padded per-tap block
    co = ab.shape[-1]                 # real output channels
    assert h % bh == 0, (h, bh)
    assert (bh * w) % 8 == 0 and w % 8 == 0, (w, bh)
    ins = [xp, k9, ab, mask_q] + ([resq] if resq is not None else [])
    in_specs = [
        pl.BlockSpec(memory_space=pl.ANY),
        pl.BlockSpec((kh, c, kh * cp_), lambda b, i: (0, 0, 0)),
        pl.BlockSpec((8, co), lambda b, i: (0, 0)),
        pl.BlockSpec((1, bh, w, co), lambda b, i: (b, i, 0, 0)),
    ]
    if resq is not None:
        in_specs.append(pl.BlockSpec((1, bh, w, co), lambda b, i: (b, i, 0, 0)))
    return pl.pallas_call(
        functools.partial(_chain_kernel, w=w, c=c, co=co, cp_=cp_, zpad=zpad,
                          has_res=resq is not None, kh=kh, bh=bh),
        grid=(bsz, h // bh),
        in_specs=in_specs,
        out_specs=pl.BlockSpec((1, bh, w, co), lambda b, i: (b, i, 0, 0)),
        out_shape=jax.ShapeDtypeStruct((bsz, h, w, co), jnp.int8),
        scratch_shapes=[
            pltpu.VMEM((bh + kh - 1, w, c), jnp.int8),
            pltpu.SemaphoreType.DMA,
        ],
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024),
        interpret=interpret,
    )(*ins)


def int8_block_conv(xc, kq, sw, bias, gt, sh, bound, mask_q, res=None):
    """One fused chain link: int8 conv (3x3 s1, or 2x2 packed-grid down link)
    + dequant·BN affine (+ residual add) + relu + mask + requant, returning
    the next int8 carry.

    xc/res: (xq int8 NHWC, bound, zero) carries; kq (kh,kh,C,Co) int8 + sw
    from int8_qkernel — kh=3 is the subm conv (padding (1,1)); kh=2 is the
    space-to-depth-packed strided SparseConv2d (padding (1,0) on the packed
    grid, see backbone_s2d.pack_down_kernel). gt/sh from the BN affine
    extraction; bound: the BN analytic activation bound for THIS conv's
    output (the residual carry bound is added for the post-add range);
    mask_q: (B,H,W,Co) int8 0/1 lane-expanded mask — W-padded stages keep
    their zpad columns valid because the mask zeroes them before requant.
    Returns (q int8, b_out, 127.0). Non-TPU platforms run the kernel in
    interpret mode (CPU tests); same math as the XLA formulation
    (models/layers.py int8_conv_affine + q8).
    """
    xq, bnd, zero = xc
    kh = kq.shape[0]
    c = kq.shape[2]
    co = kq.shape[-1]
    # Mosaic alignment (real TPU, not interpret mode): int8 operands sliced
    # along the LANE dim must be 128-aligned — "Slice shape along dimension 3
    # must be aligned to tiling (128), but is 64" on the stage-2 C=64 links.
    # Lane-pad both sides to 128: input channels pad with zpad and the
    # kernel's C rows with ZEROS (contribution exactly 0), output lanes pad
    # the epilogue (mask 0 ⇒ y=0 ⇒ q=-127, the exact-zero encoding) and are
    # sliced back after the kernel. Bit-exact either way (tests/test_int8.py
    # runs the padded shapes in interpret mode).
    c_pad = c if c % 128 == 0 else -(-c // 128) * 128
    co_pad = co if co % 128 == 0 else -(-co // 128) * 128
    if c_pad != c:
        kq = jnp.pad(kq, ((0, 0), (0, 0), (0, c_pad - c), (0, 0)))
    s_in = jnp.maximum(bnd, 1e-8) / (127.0 + zero)
    alpha = (s_in * sw * gt).astype(jnp.float32)
    # conv(x)/s_in = conv_valid(pad(xq, -zero)) + zero·Σkq (per-channel
    # constant — the zero-point term folds into beta; same identity as
    # layers.int8_conv_affine)
    ksum = kq.astype(jnp.float32).sum(axis=(0, 1, 2))
    bias_t = 0.0 if bias is None else bias
    beta = (zero * ksum * alpha + bias_t * gt + sh).astype(jnp.float32)
    if co_pad != co:
        lane_pad = ((0, co_pad - co),)
        alpha = jnp.pad(alpha, lane_pad)
        beta = jnp.pad(beta, lane_pad)
        mask_q = jnp.pad(mask_q, ((0, 0), (0, 0), (0, 0), (0, co_pad - co)))

    zpad = -int(zero)  # python float in this chain: 0.0 entry, 127.0 after
    # W alignment: the kernel's per-tap row slices need w % 8 == 0 (stage 4
    # is 180 wide, stage 5 90) — pad with zpad columns (dequantize to exact
    # 0, so real columns still see correct zero padding), mask the pad
    # columns to keep them inert, slice the int8 output back (a ~MB-scale
    # int8 copy, negligible next to the conv)
    w = xq.shape[2]
    dw = (-w) % 8
    # channel pad value is zpad (dequantizes to exact 0) AND the kernel's
    # padded C rows are zero — doubly inert
    xp = jax.lax.pad(
        xq, jnp.asarray(zpad, jnp.int8),
        [(0, 0, 0), (1, kh - 2, 0), (0, dw, 0), (0, c_pad - c, 0)])
    if dw:
        zero_i8 = jnp.asarray(0, jnp.int8)
        mask_q = jax.lax.pad(
            mask_q, zero_i8, [(0, 0, 0), (0, 0, 0), (0, dw, 0), (0, 0, 0)])
    k9 = pack_taps(kq, co_pad)

    if res is not None:
        resq, rb, rz = res
        if dw or co_pad != co:
            # pad-column/lane residual values only feed pad outputs
            # (masked) — any fill works
            resq = jax.lax.pad(
                resq, jnp.asarray(0, jnp.int8),
                [(0, 0, 0), (0, 0, 0), (0, dw, 0), (0, co_pad - co, 0)])
        rs = jnp.maximum(rb, 1e-8) / (127.0 + rz)
        b_out = bound + rb
    else:
        resq, b_out = None, bound
    s_out = 254.0 / jnp.maximum(b_out, 1e-8)

    ab = jnp.zeros((8, co_pad), jnp.float32)
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
    bh = pick_bh(mask_q.shape[1])  # output H (== input H for both kh)
    q = _chain_call(xp, k9, ab, mask_q, resq, zpad, kh=kh, bh=bh,
                    interpret=interpret)
    if dw:
        q = q[:, :, :w]
    if co_pad != co:
        q = q[..., :co]
    return q, jax.lax.stop_gradient(b_out), 127.0
