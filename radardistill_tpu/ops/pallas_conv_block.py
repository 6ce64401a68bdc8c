"""Fused conv-block chain links v2 — int8 AND bf16, halo-in-kernel.

Second generation of ops/pallas_int8_conv.py's fused link, fixing the two
measured XLA-glue costs around the v1 kernel (r4 attribution):

1. **No pre-padded input.** v1 required the caller to H-pad the activation
   with ``lax.pad`` — a full-tensor copy per conv (~2.3 ms/conv at stage 1:
   265 MB of int8 moved at 116 GB/s just to add 2 rows). v2 issues ONE
   row-clamped DMA per program and realigns the two EDGE programs with an
   in-VMEM row shift + zpad fill (a first cut with 3 separate halo DMAs
   measured a net LOSS on hardware — 2 extra per-program DMA stalls
   outweighed the pad savings across ~180 programs/conv).
2. **Compact masks.** v1 read a lane-expanded (B, H, W, Co) epilogue mask
   (66 MB/sample/conv at stage 1, plus the broadcast materialization). v2
   takes the (B, H, W, nph) occupancy (nph = 1 dense-grid, 4 = space-to-
   depth phases) and expands it on the fly: lane broadcast for nph=1, one
   tiny (bh·w, 4)x(4, Co) selector matmul for the packed grid (the DCN
   block-selector trick — ~0.3% of the conv's MXU work).

Modes (static):
- ``int8``: the frozen-teacher static chain — int8 in/out, int32 MXU
  accumulation, dequant·BN·(+residual)·relu·mask·requant epilogue on the
  accumulator. Math identical to pallas_int8_conv.int8_block_conv
  (tests/test_int8.py equivalences apply transitively).
- ``bf16``: the frozen-teacher FLOAT chain for the stages where int8
  quality-rejected (stage 2+: compounded requant error worsened the
  distill-loss floor — PERF.md r3). bf16 in/out, f32 accumulation,
  BN-affine·(+residual)·relu·mask epilogue. Numerically equivalent to the
  XLA float path (conv + eval-BN + relu + mask) at bf16 resolution; the
  MXU win is the ky-stacked N = kh·Co_pad dots vs the N=64 lane wall the
  720² stage-2 convs sit at (17.8 TF/s measured — PERF.md r4).

Layout (shared with v1): output row y needs input rows y-1..y+kh-2; per
kx the W-shift is a VMEM concat with a zpad column; the kh ky-taps stack
into ONE (C, kh·Co_pad) operand so the tap sum is aligned row/lane slices
of a single dot product.

Teacher-freeze semantics: forward-only (reference
pcdet/models/detectors/pillarnet.py:17-33); callers sever tangents before
the kernel (no JVP rule).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .pallas_int8_conv import pack_taps


def _pick_bh(h, kh):
    """Largest output-row block in {8,4,2,1} dividing H with room for the
    clamped halo DMA (bh + kh - 1 rows must fit in H)."""
    for b in (8, 4, 2, 1):
        if h % b == 0 and b + kh - 1 <= h:
            return b
    raise ValueError(f"H={h} too small for the kh={kh} halo buffer")


def _expand_mask(m, nph, c_orig, co, cp_tot, dtype):
    """(bh*w, nph) 0/1 -> (bh*w, cp_tot) epilogue multiplier.

    nph=1: lane broadcast. nph=4 (packed grid): one (bh*w, 4)x(4, cp_tot)
    selector matmul — phase p owns lanes [p*c_orig, (p+1)*c_orig); pad
    lanes (>= co) stay 0."""
    if nph == 1:
        return m.astype(dtype)  # (bh*w, 1), broadcasts over lanes
    lane = jax.lax.broadcasted_iota(jnp.int32, (nph, cp_tot), 1)
    ph = jax.lax.broadcasted_iota(jnp.int32, (nph, cp_tot), 0)
    sel = ((lane // c_orig == ph) & (lane < co)).astype(jnp.float32)
    return jax.lax.dot_general(
        m.astype(jnp.float32), sel, (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    ).astype(dtype)


def _block_kernel(x_hbm, k_ref, ab_ref, mask_ref, *refs, h, w, c, co, cp_,
                  zpad, has_res, kh, bh, int8mode, nph):
    if has_res:
        res_ref, out_ref, xbuf, sems = refs
    else:
        (out_ref, xbuf, sems), res_ref = refs, None
    b = pl.program_id(0)
    i = pl.program_id(1)
    n_i = pl.num_programs(1)
    dt_x = xbuf.dtype
    rows = bh + kh - 1

    # halo-in-kernel: ONE clamped DMA of `rows` rows (separate single-row
    # halo DMAs cost 2 extra per-program DMA stalls — measured net LOSS on
    # hardware vs v1's pre-padded input), then an in-VMEM row shift +
    # zpad fill on the two EDGE programs only. xbuf row j ends up holding
    # input row i*bh - 1 + j; out-of-range rows hold zpad (the conv's zero
    # padding — zpad dequantizes to exact 0 in the int8 chain).
    r0 = jnp.clip(i * bh - 1, 0, h - rows)  # requires h >= rows (wrapper)
    cp_in = pltpu.make_async_copy(
        x_hbm.at[b, pl.ds(r0, rows)], xbuf, sems.at[0])
    cp_in.start()
    cp_in.wait()

    @pl.when(i == 0)
    def _():
        # buffer holds rows 0..rows-1; want -1..rows-2: shift down, zpad top
        shifted = xbuf[0:rows - 1]
        xbuf[1:rows] = shifted
        xbuf[0:1] = jnp.full((1, w, c), zpad, dt_x)

    if kh == 3:
        @pl.when((i == n_i - 1) & (i > 0))
        def _():
            # buffer holds rows h-rows..h-1; want h-rows+1..h: shift up,
            # zpad bottom (kh=2 pads the top only — no bottom halo)
            shifted = xbuf[1:rows]
            xbuf[0:rows - 1] = shifted
            xbuf[rows - 1:rows] = jnp.full((1, w, c), zpad, dt_x)

    x = xbuf[:]  # (bh+kh-1, w, c)
    pcol = jnp.full((bh + kh - 1, 1, c), zpad, dt_x)
    if kh == 3:
        flats = (
            jnp.concatenate([pcol, x[:, :-1]], axis=1),   # kx=-1 column
            x,
            jnp.concatenate([x[:, 1:], pcol], axis=1),    # kx=+1 column
        )
    else:  # kh == 2: taps kx in {-1, 0} (packed-grid padding (1, 0))
        flats = (jnp.concatenate([pcol, x[:, :-1]], axis=1), x)
    acc_dt = jnp.int32 if int8mode else jnp.float32
    acc = jnp.zeros((bh * w, cp_), acc_dt)
    for kx in range(kh):
        p = jax.lax.dot_general(
            flats[kx].reshape((bh + kh - 1) * w, c), k_ref[kx],
            (((1,), (0,)), ((), ())), preferred_element_type=acc_dt)
        for ky in range(kh):
            acc += p[ky * w:ky * w + bh * w, ky * cp_:(ky + 1) * cp_]

    alpha = ab_ref[0][None, :]
    beta = ab_ref[1][None, :]
    y = acc.astype(jnp.float32) * alpha + beta
    if res_ref is not None:
        r = res_ref[0].reshape(bh * w, cp_)
        if int8mode:
            rs = ab_ref[3][0]
            rsh = ab_ref[4][0]
            y = y + (r.astype(jnp.float32) * rs + rsh)
        else:
            y = y + r.astype(jnp.float32)
    y = jnp.maximum(y, 0.0)
    m = mask_ref[0].reshape(bh * w, nph)
    y = y * _expand_mask(m, nph, co // nph, co, cp_, jnp.float32)
    if int8mode and out_ref.dtype == jnp.int8:
        s_out = ab_ref[2][0]
        q = jnp.clip(jnp.round(y * s_out) - 127.0, -127.0, 127.0)
        out_ref[:] = q.reshape(1, bh, w, cp_).astype(jnp.int8)
    else:
        # deq_out (int8 chain terminus) / bf16 mode: float write, no requant
        out_ref[:] = y.reshape(1, bh, w, cp_).astype(out_ref.dtype)


@functools.partial(
    jax.jit,
    static_argnames=("zpad", "co", "kh", "bh", "int8mode", "nph", "out_dtype",
                     "interpret"))
def _block_call(x, k9, ab, mask_c, res, zpad, co, kh=3, bh=8, int8mode=True,
                nph=1, out_dtype=None, interpret=False):
    bsz, h, w, c = x.shape
    cp_ = k9.shape[-1] // kh          # lane-padded per-tap block (128-mult)
    assert ab.shape[-1] == cp_, (ab.shape, cp_)
    assert h % bh == 0, (h, bh)
    assert (bh * w) % 8 == 0 and w % 8 == 0, (w, bh)
    ins = [x, k9, ab, mask_c] + ([res] if res is not None else [])
    in_specs = [
        pl.BlockSpec(memory_space=pl.ANY),
        pl.BlockSpec((kh, c, kh * cp_), lambda b, i: (0, 0, 0)),
        pl.BlockSpec((8, cp_), lambda b, i: (0, 0)),
        pl.BlockSpec((1, bh, w, nph), lambda b, i: (b, i, 0, 0)),
    ]
    if res is not None:
        in_specs.append(pl.BlockSpec((1, bh, w, cp_), lambda b, i: (b, i, 0, 0)))
    if out_dtype is not None:
        out_dt = out_dtype
    else:
        out_dt = jnp.int8 if int8mode else x.dtype
    return pl.pallas_call(
        functools.partial(
            _block_kernel, h=h, w=w, c=c, co=co, cp_=cp_, zpad=zpad,
            has_res=res is not None, kh=kh, bh=bh, int8mode=int8mode,
            nph=nph),
        grid=(bsz, h // bh),
        in_specs=in_specs,
        out_specs=pl.BlockSpec((1, bh, w, cp_), lambda b, i: (b, i, 0, 0)),
        out_shape=jax.ShapeDtypeStruct((bsz, h, w, cp_), out_dt),
        scratch_shapes=[
            pltpu.VMEM((bh + kh - 1, w, c), x.dtype),
            pltpu.SemaphoreType.DMA((3,)),
        ],
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024),
        interpret=interpret,
    )(*ins)


def _pad_lanes(v, cp):
    return v if v.shape[-1] == cp else jnp.pad(v, ((0, cp - v.shape[-1]),))


def int8_block(xc, kq, sw, bias, gt, sh, bound, mask_c, res=None,
               deq_out=None, keep_pad=False):
    """Dispatcher for the fused int8 chain link: v2 kernel by default,
    CONV_BLOCK_V1=1 falls back to the v1 (pre-padded input, lane-expanded
    mask) for on-hardware A/B. mask_c: COMPACT (B, H, W, nph) int8.
    deq_out=<dtype>: chain terminus — return the link's FLOAT output (no
    requant hop) instead of the int8 carry."""
    import os

    if os.environ.get("CONV_BLOCK_V1") == "1":
        from .layers import deq8
        from .pallas_int8_conv import int8_block_conv

        co = kq.shape[-1]
        mq = jnp.repeat(mask_c, co // mask_c.shape[-1], axis=-1)
        out = int8_block_conv(xc, kq, sw, bias, gt, sh, bound, mq, res=res)
        if deq_out is not None:
            # v1 has no float-out mode; requant+dequant round-trip (A/B
            # fallback only — production terminus numerics are the v2 path)
            return deq8(*out).astype(deq_out)
        return out
    return int8_block_conv_v2(xc, kq, sw, bias, gt, sh, bound, mask_c,
                              res=res, deq_out=deq_out, keep_pad=keep_pad)


def _interpret():
    return jax.devices()[0].platform != "tpu"


def int8_block_conv_v2(xc, kq, sw, bias, gt, sh, bound, mask_c, res=None,
                       deq_out=None, keep_pad=False):
    """v1-compatible fused int8 chain link on the v2 kernel.

    Same math/contract as pallas_int8_conv.int8_block_conv (q int8 carry in,
    dequant·BN·(+res)·relu·mask·requant, (q, bound, 127) out) with the halo
    handled in-kernel (no lax.pad copy) and a COMPACT (B, H, W, nph) int8
    occupancy mask (nph = 1 dense / 4 packed-grid phases) instead of the
    lane-expanded (B, H, W, Co) one.
    """
    xq, bnd, zero = xc
    kh, _, c_real, co = kq.shape
    nph = mask_c.shape[-1]
    if xq.shape[-1] != c_real:
        # lane-padded carry (chain invariant): extra kernel C rows are zero
        kq = jnp.pad(kq, ((0, 0), (0, 0), (0, xq.shape[-1] - c_real), (0, 0)))
    if xq.shape[-1] % 128:
        # Mosaic manual-DMA lane alignment (zero kernel rows keep it exact)
        cpad = -(-xq.shape[-1] // 128) * 128 - xq.shape[-1]
        xq = jnp.pad(xq, ((0, 0), (0, 0), (0, 0), (0, cpad)))
        kq = jnp.pad(kq, ((0, 0), (0, 0), (0, cpad), (0, 0)))
    cp = co if co % 128 == 0 else -(-co // 128) * 128

    s_in = jnp.maximum(bnd, 1e-8) / (127.0 + zero)
    alpha = (s_in * sw * gt).astype(jnp.float32)
    ksum = kq.astype(jnp.float32).sum(axis=(0, 1, 2))
    bias_t = 0.0 if bias is None else bias
    beta = (zero * ksum * alpha + bias_t * gt + sh).astype(jnp.float32)
    alpha, beta = _pad_lanes(alpha, cp), _pad_lanes(beta, cp)

    zpad = -int(zero)
    w = xq.shape[2]
    dw = (-w) % 8
    if dw:  # rare (stage>=4 chains): zpad cols stay inert under the 0 mask
        xq = jax.lax.pad(xq, jnp.asarray(zpad, jnp.int8),
                         [(0, 0, 0), (0, 0, 0), (0, dw, 0), (0, 0, 0)])
        mask_c = jax.lax.pad(mask_c, jnp.asarray(0, jnp.int8),
                             [(0, 0, 0), (0, 0, 0), (0, dw, 0), (0, 0, 0)])
    k9 = pack_taps(kq, cp)

    if res is not None:
        resq, rb, rz = res
        if dw or resq.shape[-1] != cp:
            resq = jax.lax.pad(
                resq, jnp.asarray(0, jnp.int8),
                [(0, 0, 0), (0, 0, 0), (0, dw, 0), (0, cp - resq.shape[-1], 0)])
        rs = jnp.maximum(rb, 1e-8) / (127.0 + rz)
        b_out = bound + rb
    else:
        resq, b_out = None, bound
    s_out = 254.0 / jnp.maximum(b_out, 1e-8)

    ab = jnp.zeros((8, cp), jnp.float32)
    ab = ab.at[0].set(alpha)
    ab = ab.at[1].set(beta)
    ab = ab.at[2].set(s_out)
    if res is not None:
        ab = ab.at[3].set(_pad_lanes(rs * jnp.ones((co,), jnp.float32), cp))
        ab = ab.at[4].set(_pad_lanes(rz * rs * jnp.ones((co,), jnp.float32), cp))

    # frozen-teacher only: sever tangents BEFORE the kernel (no JVP rule)
    xq, k9, ab, mask_c, resq = jax.lax.stop_gradient(
        (xq, k9, ab, mask_c, resq))
    bh = _pick_bh(xq.shape[1], kh)
    q = _block_call(xq, k9, ab, mask_c, resq, zpad, co, kh=kh, bh=bh,
                    int8mode=True, nph=nph, out_dtype=deq_out,
                    interpret=_interpret())
    if dw:
        q = q[:, :, :w]
    if cp != co and not keep_pad:
        q = q[..., :co]
    if deq_out is not None:
        # chain terminus: the link's float output directly (NO extra requant
        # hop — identical semantics to the XLA int8_conv_affine+relu+mask)
        return q
    return q, jax.lax.stop_gradient(b_out), 127.0


def fp_block_conv(x, kernel, bias, gt, sh, mask_c, res=None, keep_pad=False):
    """Fused bf16 chain link: relu(conv(x)·γ̃ + (bias·γ̃ + shift) [+ res]) · mask.

    The frozen-teacher FLOAT analog of the int8 link for the stages where
    int8 quality-rejected: exact same math as [Conv2dTorch + eval-BN + relu
    + mask] at bf16 resolution, with the ky-stacked N = kh·Co_pad dots
    breaking the small-N lane wall (stage-2 720²/C=64 convs measured at
    17.8 TF/s in XLA — PERF.md r4). kernel: (kh, kh, C, Co) raw float
    params; gt/sh: the eval-BN affine. kh=2 = packed-grid strided link.

    Lane alignment: Mosaic's manual halo DMA needs the input lane dim to be
    a 128-multiple (hardware: "Slice shape along dimension 3 must be aligned
    to tiling (128)") — inputs are lane-padded here if needed, and
    ``keep_pad`` leaves the OUTPUT padded so a chain of C=64 links (teacher
    stage 2) pays the pad copy once at stage entry, not per link. Padded
    kernel rows are zero and padded out lanes carry exact zeros (alpha/beta
    pad = 0, the mask selector bounds at the real co).
    """
    kh, _, c_real, co = kernel.shape
    nph = mask_c.shape[-1]
    dt = x.dtype
    if x.shape[-1] != c_real:
        # lane-padded carry: extra kernel C rows are zero (exact no-op)
        kernel = jnp.pad(
            kernel, ((0, 0), (0, 0), (0, x.shape[-1] - c_real), (0, 0)))
    if x.shape[-1] % 128:
        cpad = -(-x.shape[-1] // 128) * 128 - x.shape[-1]
        x = jnp.pad(x, ((0, 0), (0, 0), (0, 0), (0, cpad)))
        kernel = jnp.pad(kernel, ((0, 0), (0, 0), (0, cpad), (0, 0)))
    cp = co if co % 128 == 0 else -(-co // 128) * 128

    alpha = _pad_lanes(gt.astype(jnp.float32), cp)
    bias_t = 0.0 if bias is None else bias
    beta = _pad_lanes((bias_t * gt + sh).astype(jnp.float32), cp)

    w = x.shape[2]
    dw = (-w) % 16  # bf16 sublane tile is 16 (f32/int8 paths use 8)
    if dw:
        x = jnp.pad(x, ((0, 0), (0, 0), (0, dw), (0, 0)))
        mask_c = jax.lax.pad(mask_c, jnp.asarray(0, mask_c.dtype),
                             [(0, 0, 0), (0, 0, 0), (0, dw, 0), (0, 0, 0)])
    k9 = pack_taps(kernel.astype(dt), cp)

    if res is not None and (dw or res.shape[-1] != cp):
        res = jnp.pad(
            res, ((0, 0), (0, 0), (0, dw), (0, cp - res.shape[-1])))

    ab = jnp.zeros((8, cp), jnp.float32)
    ab = ab.at[0].set(alpha)
    ab = ab.at[1].set(beta)

    x, k9, ab, mask_c, res = jax.lax.stop_gradient((x, k9, ab, mask_c, res))
    bh = _pick_bh(x.shape[1], kh)
    y = _block_call(x, k9, ab, mask_c, res, 0.0, co, kh=kh, bh=bh,
                    int8mode=False, nph=nph, interpret=_interpret())
    if dw:
        y = y[:, :, :w]
    if cp != co and not keep_pad:
        y = y[..., :co]
    return y
