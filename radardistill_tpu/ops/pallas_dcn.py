"""Pallas TPU kernels for modulated deformable conv (DCNv2) — fwd AND bwd.

Round-3 headline perf item (PERF.md r3 attribution): the CMA's two DCN
downsamples cost ~59 ms/step at bs2@1440² — ~27 ms of sorted-domain corner
gathers in forward and ~32 ms of backward (scatter-adds of 2·90²·9 weighted
tap rows into the 2·180² input grad at 18-53 GB/s + offset/mask grads).
Row-indexed gathers/scatters pay the TPU per-row wall (~15-130 ns/row)
regardless of layout; these kernels remove ALL per-row machinery:

  Bilinear sampling is a 4-nonzero interpolation matrix M. For one output
  row ho, every tap position lies (after clamping offsets to ±R) inside a
  32-input-row window, so per tap ``sampled = M @ patch`` is ONE MXU matmul
  of (Wo, 32·W)x(32·W, C) — the expand-kernel trick (ops/pallas_expand.py)
  generalized to weighted 4-corner rows with a 2D window:

  - K1 `dcn_sample`: corner weights folded with the modulation mask →
    sampled taps (B, Ho, Wo, 9·C) TAP-MAJOR LANES, so the conv contraction
    with the (9·Ci, Co) weight is a plain last-dim matmul in XLA (fuses,
    provides dW via plain matmul transpose, and needs NO relayout of the
    75 MB tap tensor — the r3 profile showed 22 ms/step of copies around
    the earlier (B,Ho,9,Wo,C) layout).
  - K2 `dcn_offset_grad`: per tap, P = dsm @ patchᵀ ONCE (one MXU matmul),
    then the ∂wt/∂Δh and ∂wt/∂Δw one-hot matrices reduce elementwise
    against P → dΔ directly as (B, Ho, WoP, 18). Half the MXU work of
    materializing unmasked derivative samples, none of their HBM traffic.
  - K3 `dcn_input_grad`: the transpose. Each (GRAD_IR, GC) input-cell block
    receives only from a bounded (rows, woc) window of output sites per
    tap, DMA'd at dynamic offsets; dX_block += Mᵀ-style
    (cells, samples)x(samples, C) matmuls. No scatter anywhere.

  All three kernels chunk the COLUMN dimension too (OC output cols for
  K1/K2, GC input cols for K3): the one-hot matmuls contract over
  rows·cols window CELLS, and full-width windows paid ~3x the FLOPs each
  chunk actually touches (patch_cols/woc vs W8/Wo8).
  - dmask needs no kernel: sampled = mask·s_unmasked ⇒
    dmask[p] = ⟨dsampled[p], sampled[p]⟩ / max(mask, 1e-6).

TPU-native design decision: offsets are clamped to ±R cells
(R = max_offset, default 5) so every sample stays inside the DMA'd window —
and the window SIZE sets the kernels' MXU cost (the one-hot matmuls
contract over patch_rows(R)·W cells), so R is a speed knob: R=8 windows
cost 1.5x R=5. The reference CUDA kernel
(modulated_deform_im2col_cuda.cuh) allows unbounded offsets; |Δ| ≤ 5 cells
at the 8×-stride BEV (0.6 m/cell ⇒ ±3 m of deformation) is far beyond
what the CMA downsample needs, the
clamp gradient is the standard clip pass-through, and the clamp rate can
be monitored cheaply outside (see dcn.py wrapper). Exactness inside the
clamp region is tested vs the reference formulation in
tests/test_pallas_dcn.py (interpret mode, f32).

Geometry (reference convention, ops/dcn.py / the CUDA kernel): tap k=(ki,kj)
row-major, offset channel 2k = Δy, 2k+1 = Δx; sample position
p = (ho·stride - pad + ki + Δy, wo·stride - pad + kj + Δx); zeros outside
the grid (out-of-window one-hot rows match nothing → exact zeros).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

def _round8(n):
    return -(-n // 8) * 8


def patch_rows(r):
    """K1/K2 input-row window: covers the 2R+6 rows a clamped tap can touch
    (8-aligned for the DMA). R=5 -> 16 rows, R=8 -> 24. The one-hot window
    matmuls cost FLOPs proportional to this window, so production runs at
    R=5 (±3 m at the stride-8 BEV) — see dcn.py dispatcher."""
    return _round8(2 * r + 6)


def grad_rows(r):
    """K3 output-row window: output rows feeding a GRAD_IR-row input block
    span (GRAD_IR + 2R + 6)/stride + 1 = R + 9 rows (stride 2, GRAD_IR 10).
    R=5 -> 16, R=8 -> 24."""
    return _round8(r + 9)


def patch_cols(oc, r, stride):
    """K1/K2 input-col window for an OC-wide output-col chunk (the column
    analog of patch_rows): the clamped taps of outputs [o0, o0+OC) touch
    input cols [o0·s − 1 − r, (o0+OC−1)·s + 2 + r] — width OC·s + 2r + 4,
    plus 8 slack because the window START must floor to a multiple of 8
    (sublane-dim DMA offsets must be 8-aligned on TPU). Column chunking is
    the K1/K2 FLOP lever: the one-hot window matmuls contract over
    rows·cols CELLS, and the full-width window paid for the whole grid row
    (W8=184) when each chunk only touches ~56."""
    return _round8(oc * stride + 2 * r + 12)


OC = 16  # K1/K2 output-col chunk (8-divisible: Mosaic block constraint);
         # Wo is padded to a multiple of OC, padded cols sample exact zeros
         # (zero offsets land off-grid) and are sliced away at the boundary


def _pad_wo(t, wo):
    """Pad dim 2 (Wo) to a multiple of OC."""
    wop = -(-wo // OC) * OC
    if wop == wo:
        return t, wop
    return jnp.pad(t, ((0, 0), (0, 0), (0, wop - wo), (0, 0))), wop


GRAD_IR = 10             # K3 input-row block (divides both CMA heights 180/90)

# Mosaic's default scoped-VMEM limit is 16 MB; K2's two derivative modes
# need ~18 MB of stack at the 180² CMA site. v5e has 128 MB VMEM — raise
# the scope rather than shrink the MXU tiles.
_COMPILER_PARAMS = pltpu.CompilerParams(vmem_limit_bytes=48 * 1024 * 1024)


def _corner_tables():
    # (a, b) corner offsets and weight factor selectors
    return ((0, 0), (0, 1), (1, 0), (1, 1))


def _tap_geometry(i_ho, o0, offs, k, stride, pad, r):
    """Per-tap sample coords for output row i_ho, output cols [o0, o0+OC).

    offs: (OC, 18) f32 chunk. Returns (ph, pw) f32 (OC,) ABSOLUTE positions."""
    ki, kj = k // 3, k % 3
    dy = jnp.clip(offs[:, 2 * k], -r, r)
    dx = jnp.clip(offs[:, 2 * k + 1], -r, r)
    wo = o0 + jax.lax.broadcasted_iota(
        jnp.int32, (offs.shape[0], 1), 0)[:, 0].astype(jnp.float32)
    ph = (i_ho * stride - pad + ki) + dy
    pw = (wo * stride - pad + kj) + dx
    return ph, pw


def _weights(dh, dw, a, b, mode):
    """Corner weight for fraction (dh, dw) at corner (a, b).

    mode: 'w' value weight; 'dh'/'dw' derivative w.r.t. Δh / Δw."""
    fh = dh if a else (1.0 - dh)
    fw = dw if b else (1.0 - dw)
    gh = 1.0 if a else -1.0
    gw = 1.0 if b else -1.0
    if mode == "w":
        return fh * fw
    if mode == "dh":
        return gh * fw
    if mode == "dw":
        return fh * gw
    raise ValueError(mode)


def _build_m(ph, pw, r0, c0, w_valid, ic, n_cells_rows, mode, extra=None,
             dtype=jnp.float32):
    """Interpolation matrix (OC, n_cells_rows*ic) f32 for one tap.

    ph/pw absolute f32 positions; rows local to the window starting at row
    r0, cols local to the window starting at col c0 (width ic, 8-aligned).
    w_valid: logical grid width (absolute bound). extra: optional (OC,)
    multiplier (modulation mask)."""
    wo = ph.shape[0]
    h0 = jnp.floor(ph)
    w0 = jnp.floor(pw)
    dh = ph - h0
    dw = pw - w0
    n = n_cells_rows * ic
    iota = jax.lax.broadcasted_iota(jnp.int32, (wo, n), 1)
    m = jnp.zeros((wo, n), dtype)
    for a, b in _corner_tables():
        hi = h0.astype(jnp.int32) + a - r0
        wi = w0.astype(jnp.int32) + b
        valid_w = (wi >= 0) & (wi < w_valid)
        idx = jnp.where(valid_w, hi * ic + (wi - c0), -1)
        wt = _weights(dh, dw, a, b, mode)
        if extra is not None:
            wt = wt * extra
        m = m + wt.astype(dtype)[:, None] * (idx[:, None] == iota).astype(dtype)
    return m


def _build_m3(ph, pw, r0, c0, w_valid, ic, n_cells_rows, dtype=jnp.float32):
    """Fused 3-mode interpolation matrices (value, d/dΔh, d/dΔw) sharing ONE
    (idx == iota) one-hot per corner — the one-hot compares dominate the
    build cost, so this is ~3x cheaper than three _build_m calls (and
    cheaper than the two the pre-r5 K2 made)."""
    wo = ph.shape[0]
    h0 = jnp.floor(ph)
    w0 = jnp.floor(pw)
    dh = ph - h0
    dw = pw - w0
    n = n_cells_rows * ic
    iota = jax.lax.broadcasted_iota(jnp.int32, (wo, n), 1)
    mv = jnp.zeros((wo, n), dtype)
    mh = jnp.zeros((wo, n), dtype)
    mw = jnp.zeros((wo, n), dtype)
    for a, b in _corner_tables():
        hi = h0.astype(jnp.int32) + a - r0
        wi = w0.astype(jnp.int32) + b
        valid_w = (wi >= 0) & (wi < w_valid)
        idx = jnp.where(valid_w, hi * ic + (wi - c0), -1)
        onehot = (idx[:, None] == iota).astype(dtype)
        fh = dh if a else (1.0 - dh)
        fw = dw if b else (1.0 - dw)
        gh = 1.0 if a else -1.0
        gw = 1.0 if b else -1.0
        mv = mv + (fh * fw).astype(dtype)[:, None] * onehot
        mh = mh + (gh * fw).astype(dtype)[:, None] * onehot
        mw = mw + (fh * gw).astype(dtype)[:, None] * onehot
    return mv, mh, mw


def _sample_kernel(offs_ref, mask_ref, x_hbm, out_ref, patch, sem,
                   *, stride, pad, r, H, W, W8, rows, oc, ic):
    b = pl.program_id(0)
    i = pl.program_id(1)
    o0 = pl.program_id(2) * oc
    r0 = jnp.clip(i * stride - pad - r - 1, 0, H - rows)
    # sublane-dim DMA offsets must be 8-aligned: floor to 8 (patch_cols
    # carries the matching slack)
    c0 = jnp.clip((o0 * stride - pad - r - 1) // 8, 0, (W8 - ic) // 8) * 8
    cp = pltpu.make_async_copy(
        x_hbm.at[b, pl.ds(r0, rows), pl.ds(c0, ic)], patch, sem)
    cp.start()
    offs = offs_ref[0, 0]          # (OC, 18) f32
    cp.wait()
    pf = patch[:].reshape(rows * ic, x_hbm.shape[-1])
    C = x_hbm.shape[-1]
    for k in range(9):
        ph, pw = _tap_geometry(i, o0, offs, k, stride, pad, r)
        extra = mask_ref[0, 0][:, k] if mask_ref is not None else None
        m = _build_m(ph, pw, r0, c0, W, ic, rows, "w", extra, dtype=pf.dtype)
        out_ref[0, 0, :, k * C:(k + 1) * C] = jnp.dot(
            m, pf, preferred_element_type=jnp.float32
        ).astype(out_ref.dtype)


def dcn_sample(x, offset18, mask9, *, stride=2, padding=1, max_offset=5,
               interpret=False):
    """K1: masked bilinear tap sampling. Returns (B, Ho, Wo, 9*C) —
    tap-major lanes, so the weight contraction around the kernel is a
    PLAIN last-dim matmul (the earlier (B,Ho,9,Wo,C) layout made XLA
    relayout the 75 MB tap tensor around every einsum — 22 ms/step of
    copies in the r3 profile)."""
    B, H, W, C = x.shape
    W8 = -(-W // 8) * 8  # Mosaic DMA slices need 8-aligned sublane extents
    if W8 != W:
        x = jnp.pad(x, ((0, 0), (0, 0), (0, W8 - W), (0, 0)))
    Ho, Wo = offset18.shape[1], offset18.shape[2]
    rows = patch_rows(max_offset)
    offset18, wop = _pad_wo(offset18, Wo)
    mask9, _ = _pad_wo(mask9, Wo)
    oc = wop  # full-width chunk: OC<wop cut window FLOPs ~3x but 6x'd the
    # number of small MXU dots — measured NET LOSS (PERF.md r3); the
    # chunking machinery stays for shapes where Wo is large
    ic = min(patch_cols(oc, max_offset, stride), W8)

    def kernel(offs_ref, mask_ref, x_hbm, out_ref, patch, sem):
        _sample_kernel(offs_ref, mask_ref, x_hbm, out_ref, patch, sem,
                       stride=stride, pad=padding, r=max_offset, H=H, W=W,
                       W8=W8, rows=rows, oc=oc, ic=ic)

    return pl.pallas_call(
        kernel,
        grid=(B, Ho, wop // oc),
        in_specs=[
            pl.BlockSpec((1, 1, oc, 18), lambda b, i, o: (b, i, o, 0)),
            pl.BlockSpec((1, 1, oc, 9), lambda b, i, o: (b, i, o, 0)),
            pl.BlockSpec(memory_space=pl.ANY),
        ],
        out_specs=pl.BlockSpec(
            (1, 1, oc, 9 * C), lambda b, i, o: (b, i, o, 0)),
        out_shape=jax.ShapeDtypeStruct((B, Ho, wop, 9 * C), x.dtype),
        scratch_shapes=[
            pltpu.VMEM((rows, ic, C), x.dtype),
            pltpu.SemaphoreType.DMA,
        ],
        compiler_params=_COMPILER_PARAMS,
        interpret=interpret,
    )(offset18, mask9, x)


def _offgrad_kernel(offs_ref, mask_ref, dsamp_ref, x_hbm, out_ref, dm_ref,
                    patch, sem, *, stride, pad, r, H, W, W8, rows, oc, ic):
    """K2 (fused): per-tap P = dsm @ patchᵀ once, then the two derivative
    one-hot matrices reduce ELEMENTWISE against P — halves the K2 MXU work
    vs materializing unmasked derivative sample tensors (and removes their
    (B,Ho,2,9,Wo,C) HBM round-trip entirely).

    r5 fusion: P is built from the UNMASKED dsampled; the per-site mask
    scalar multiplies the reduced offset grads (chain factor), and a third
    'w'-mode reduce against the SAME P gives dmask_k = <dsampled_k,
    s_unmasked_k> directly — exact (no eps division) and it absorbs what
    used to be caller-side glue: the 40-80 MB `dsm = dsampled * mask`
    materialization and the dmask selector matmul over two 9C-lane tensors
    (r5 profile: the dcn glue class ran 22.9 ms @81 GB/s)."""
    b = pl.program_id(0)
    i = pl.program_id(1)
    o0 = pl.program_id(2) * oc
    r0 = jnp.clip(i * stride - pad - r - 1, 0, H - rows)
    c0 = jnp.clip((o0 * stride - pad - r - 1) // 8, 0, (W8 - ic) // 8) * 8
    cp = pltpu.make_async_copy(
        x_hbm.at[b, pl.ds(r0, rows), pl.ds(c0, ic)], patch, sem)
    cp.start()
    offs = offs_ref[0, 0]          # (OC, 18) f32
    mask = mask_ref[0, 0]          # (OC, 9) f32
    cp.wait()
    pf = patch[:].reshape(rows * ic, x_hbm.shape[-1])
    C = x_hbm.shape[-1]
    for k in range(9):
        ph, pw = _tap_geometry(i, o0, offs, k, stride, pad, r)
        ds_k = dsamp_ref[0, 0][:, k * C:(k + 1) * C]   # (OC, C) UNMASKED
        p = jax.lax.dot_general(
            ds_k, pf, (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        )                           # (OC, rows*ic)
        mv, mh, mw = _build_m3(ph, pw, r0, c0, W, ic, rows)
        # output layout (OC, 18): lane dim 18 == full array dim (Mosaic
        # block rule) — also drops the (B,Ho,18,Wo) transpose at the caller
        mk = mask[:, k]
        out_ref[0, 0, :, 2 * k] = (
            mk * jnp.sum(mh * p, axis=1)).astype(out_ref.dtype)
        out_ref[0, 0, :, 2 * k + 1] = (
            mk * jnp.sum(mw * p, axis=1)).astype(out_ref.dtype)
        dm_ref[0, 0, :, k] = jnp.sum(mv * p, axis=1).astype(dm_ref.dtype)


def dcn_offset_grad(x, offset18, dsampled, mask9p, *, stride=2, padding=1,
                    max_offset=5, interpret=False):
    """K2: offset gradients (B, Ho, WoP, 18) f32 AND mask gradients
    (B, Ho, WoP, 9) f32 from the UNMASKED dsampled (B, Ho, WoP, 9*C)
    (WoP = Wo padded to OC); channel 2k = dΔy of tap k, 2k+1 = dΔx.
    Clamp pass-through applied by the caller."""
    B, H, W, C = x.shape
    W8 = -(-W // 8) * 8
    if W8 != W:
        x = jnp.pad(x, ((0, 0), (0, 0), (0, W8 - W), (0, 0)))
    Ho, Wo = offset18.shape[1], offset18.shape[2]
    rows = patch_rows(max_offset)
    offset18, wop = _pad_wo(offset18, Wo)
    assert dsampled.shape[2] == wop, (dsampled.shape, wop)  # caller works padded
    assert mask9p.shape[2] == wop, (mask9p.shape, wop)
    oc = wop  # full-width chunk (see dcn_sample: chunking measured a loss)
    ic = min(patch_cols(oc, max_offset, stride), W8)

    def kernel(offs_ref, mask_ref, dsamp_ref, x_hbm, out_ref, dm_ref, patch,
               sem):
        _offgrad_kernel(offs_ref, mask_ref, dsamp_ref, x_hbm, out_ref, dm_ref,
                        patch, sem, stride=stride, pad=padding, r=max_offset,
                        H=H, W=W, W8=W8, rows=rows, oc=oc, ic=ic)

    return pl.pallas_call(
        kernel,
        grid=(B, Ho, wop // oc),
        in_specs=[
            pl.BlockSpec((1, 1, oc, 18), lambda b, i, o: (b, i, o, 0)),
            pl.BlockSpec((1, 1, oc, 9), lambda b, i, o: (b, i, o, 0)),
            pl.BlockSpec((1, 1, oc, 9 * C), lambda b, i, o: (b, i, o, 0)),
            pl.BlockSpec(memory_space=pl.ANY),
        ],
        out_specs=[
            pl.BlockSpec((1, 1, oc, 18), lambda b, i, o: (b, i, o, 0)),
            pl.BlockSpec((1, 1, oc, 9), lambda b, i, o: (b, i, o, 0)),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((B, Ho, wop, 18), jnp.float32),
            jax.ShapeDtypeStruct((B, Ho, wop, 9), jnp.float32),
        ],
        scratch_shapes=[
            pltpu.VMEM((rows, ic, C), x.dtype),
            pltpu.SemaphoreType.DMA,
        ],
        compiler_params=_COMPILER_PARAMS,
        interpret=interpret,
    )(offset18, mask9p, dsampled, x)


def _grad_kernel(offs_hbm, dsm_hbm, out_ref, dsm_buf, offs_buf, acc, sem,
                 sem2, *, stride, pad, r, H, W, Ho, Wo8, C, rows, gc, woc):
    b = pl.program_id(0)
    j = pl.program_id(1)
    h_base = j * GRAD_IR
    c_base = pl.program_id(2) * gc
    r0o = jnp.clip((h_base - r - 5) // stride, 0, Ho - rows)
    # sublane-dim DMA offsets must be 8-aligned: floor to 8 (woc carries
    # the matching slack)
    w0o = jnp.clip((c_base - r - 2) // stride // 8, 0, (Wo8 - woc) // 8) * 8
    pltpu.make_async_copy(
        offs_hbm.at[b, pl.ds(r0o, rows), pl.ds(w0o, woc)], offs_buf, sem,
    ).start()
    # ONE DMA of the tap-major dsm window (rows, woc, 9C) reused by all 9
    # taps (lane slices) — was 9 per-tap DMAs in the (B,Ho,9,Wo,C) layout
    pltpu.make_async_copy(
        dsm_hbm.at[b, pl.ds(r0o, rows), pl.ds(w0o, woc)], dsm_buf, sem2,
    ).start()
    acc[:] = jnp.zeros((GRAD_IR * gc, C), jnp.float32)
    pltpu.make_async_copy(
        offs_hbm.at[b, pl.ds(r0o, rows), pl.ds(w0o, woc)], offs_buf, sem,
    ).wait()
    pltpu.make_async_copy(
        dsm_hbm.at[b, pl.ds(r0o, rows), pl.ds(w0o, woc)], dsm_buf, sem2,
    ).wait()
    offs = offs_buf[:]  # (rows, woc, 128) f32; lanes 0..17 offsets, lanes
    # 18..26 the modulation mask (packed by dcn_input_grad so the in-kernel
    # dsampled*mask fold needs no extra operand); cols >= Wo zero-pad
    n_cells = GRAD_IR * gc
    # M is built in SUB-row chunks of the output-row window to bound
    # VMEM; geometry stays (sub, woc)-shaped and only the LEADING dims are
    # merged before the dot (Mosaic rejects 2D->1D lane-eliminating casts)
    sub = 4  # output rows per chunk
    n_samp = sub * woc
    iota3 = jax.lax.broadcasted_iota(jnp.int32, (sub, woc, n_cells), 2)
    wo_col = jax.lax.broadcasted_iota(jnp.int32, (sub, woc), 1).astype(jnp.float32)
    for k in range(9):
        ki, kj = k // 3, k % 3
        for a3 in range(rows // sub):
            offs_c = offs[a3 * sub:(a3 + 1) * sub]  # (sub, woc, 18)
            ho = (
                jax.lax.broadcasted_iota(jnp.int32, (sub, woc), 0).astype(jnp.float32)
                + (r0o + a3 * sub).astype(jnp.float32)
            )
            dy = jnp.clip(offs_c[:, :, 2 * k], -r, r)
            dx = jnp.clip(offs_c[:, :, 2 * k + 1], -r, r)
            ph = (ho * stride - pad + ki) + dy
            pw = ((w0o.astype(jnp.float32) + wo_col) * stride - pad + kj) + dx
            h0 = jnp.floor(ph)
            w0 = jnp.floor(pw)
            dh = ph - h0
            dw = pw - w0
            h0i = h0.astype(jnp.int32)
            w0i = w0.astype(jnp.int32)
            m3 = jnp.zeros((sub, woc, n_cells), jnp.float32)
            for a, bb in _corner_tables():
                hi = h0i + a - h_base
                wi = w0i + bb
                wl = wi - c_base
                valid = ((hi >= 0) & (hi < GRAD_IR) & (wi >= 0) & (wi < W)
                         & (wl >= 0) & (wl < gc))
                idx = jnp.where(valid, hi * gc + wl, -1)
                wt = _weights(dh, dw, a, bb, "w")
                m3 = m3 + wt[..., None] * (
                    idx[..., None] == iota3).astype(jnp.float32)
            m = m3.reshape(n_samp, n_cells)
            # mask fold (r5): dsm_buf holds the UNMASKED dsampled window;
            # multiply by the per-site mask lane here instead of shipping a
            # separate 40-80 MB dsm tensor through HBM
            mask_c = offs_c[:, :, 18 + k]
            ds_flat = (
                dsm_buf[a3 * sub:(a3 + 1) * sub, :, k * C:(k + 1) * C]
                * mask_c[..., None].astype(dsm_buf.dtype)
            ).reshape(n_samp, C)
            acc[:] = acc[:] + jax.lax.dot_general(
                m.astype(ds_flat.dtype), ds_flat,
                (((0,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            )
    out_ref[0] = acc[:].reshape(GRAD_IR, gc, C).astype(out_ref.dtype)


def dcn_input_grad(dsampled, offset18, mask9, H, W, *, stride=2, padding=1,
                   max_offset=5, interpret=False):
    """K3: dX (B, H, W, C) from UNMASKED dsampled (B, Ho, Wo, 9*C); the
    modulation mask is folded in-kernel (packed into lanes 18..26 of the
    offsets operand) instead of shipping a materialized dsampled*mask
    tensor through HBM (r5 glue cut).

    Full-width input-row blocks; all DMA'd sublane extents are padded to
    multiples of 8 (Mosaic alignment): dsampled/offsets in Wo, the dX
    output in W (sliced back outside). Zero-padded sample rows contribute
    zeros."""
    dsm = dsampled
    B, Ho, Wo, C9 = dsm.shape
    C = C9 // 9
    if offset18.shape[2] != Wo:  # dsm arrives in the OC-padded Wo domain
        offset18 = jnp.pad(
            offset18, ((0, 0), (0, 0), (0, Wo - offset18.shape[2]), (0, 0)))
    if mask9.shape[2] != Wo:
        mask9 = jnp.pad(
            mask9, ((0, 0), (0, 0), (0, Wo - mask9.shape[2]), (0, 0)))
    Wo8 = -(-Wo // 8) * 8
    # input-col blocks (the K3 FLOP lever — see patch_cols): n_cells shrinks
    # from GRAD_IR·W8 to GRAD_IR·GC and the output-col window from Wo8 to
    # WOC, quadratically cutting the one-hot matmul work per block
    GC = -(-W // 8) * 8  # full-width col block (chunking measured a loss)
    Wp = GC
    woc = min(_round8((GC + 2 * max_offset + 4) // stride + 10), Wo8)
    if Wo8 != Wo:
        dsm = jnp.pad(dsm, ((0, 0), (0, 0), (0, Wo8 - Wo), (0, 0)))
        offset18 = jnp.pad(
            offset18, ((0, 0), (0, 0), (0, Wo8 - Wo), (0, 0)))
        mask9 = jnp.pad(mask9, ((0, 0), (0, 0), (0, Wo8 - Wo), (0, 0)))
    # lane dim of a DMA'd operand must be 128-aligned (Mosaic): pack
    # offsets (18) + mask (9) + zero pad -> 128 lanes, ONE small f32 operand
    offset18 = jnp.concatenate(
        [offset18, mask9.astype(jnp.float32),
         jnp.zeros(offset18.shape[:3] + (128 - 27,), jnp.float32)], axis=-1)

    rows = grad_rows(max_offset)

    def kernel(offs_hbm, dsm_hbm, out_ref, dsm_buf, offs_buf, acc, sem, sem2):
        _grad_kernel(offs_hbm, dsm_hbm, out_ref, dsm_buf, offs_buf, acc, sem,
                     sem2, stride=stride, pad=padding, r=max_offset,
                     H=H, W=W, Ho=Ho, Wo8=Wo8, C=C, rows=rows, gc=GC, woc=woc)

    dx = pl.pallas_call(
        kernel,
        grid=(B, H // GRAD_IR, Wp // GC),
        in_specs=[
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec(memory_space=pl.ANY),
        ],
        out_specs=pl.BlockSpec(
            (1, GRAD_IR, GC, C), lambda b, j, w: (b, j, w, 0)
        ),
        out_shape=jax.ShapeDtypeStruct((B, H, Wp, C), dsm.dtype),
        scratch_shapes=[
            pltpu.VMEM((rows, woc, 9 * C), dsm.dtype),
            pltpu.VMEM((rows, woc, 128), jnp.float32),
            pltpu.VMEM((GRAD_IR * GC, C), jnp.float32),
            pltpu.SemaphoreType.DMA,
            pltpu.SemaphoreType.DMA,
        ],
        compiler_params=_COMPILER_PARAMS,
        interpret=interpret,
    )(offset18, dsm)
    return dx[:, :, :W, :]


def shapes_supported(x_shape, offset_shape, stride, padding, kernel_size,
                     max_offset=5):
    """Static check: can the kernels handle this DCN instance?"""
    B, H, W, C = x_shape
    Ho, Wo = offset_shape[1], offset_shape[2]
    return (
        kernel_size == 3
        and stride == 2
        and padding == 1
        and max_offset <= 9
        and H >= patch_rows(max_offset)
        and H % GRAD_IR == 0
        and Ho >= grad_rows(max_offset)
        and C % 128 == 0
    )


@functools.partial(jax.custom_vjp, nondiff_argnums=(4, 5, 6, 7))
def modulated_deform_conv_mxu(x, offset, mask, weight, stride=2, padding=1,
                              max_offset=5, interpret=False):
    """DCNv2 via the Pallas kernels; same contract as
    ops/dcn.py::modulated_deform_conv (offsets clamped to ±max_offset)."""
    y, _ = _mdcn_fwd(x, offset, mask, weight, stride, padding, max_offset,
                     interpret)
    return y


def _prep(offset, mask):
    B, Ho, Wo = offset.shape[:3]
    offset18 = offset.astype(jnp.float32).reshape(B, Ho, Wo, 18)
    mask9 = mask.astype(jnp.float32).reshape(B, Ho, Wo, 9)
    return offset18, mask9


def _mdcn_fwd(x, offset, mask, weight, stride, padding, max_offset, interpret):
    offset18, mask9 = _prep(offset, mask)
    Wo = offset.shape[2]
    # sampled is tap-major lanes (B, Ho, WoP, 9C): the contraction is a
    # plain last-dim matmul — no relayout of the 9-tap tensor anywhere; the
    # whole pipeline (fwd + bwd kernels) works in the OC-padded Wo domain,
    # slicing only at the y/grad boundaries (padded cols are exact zeros)
    sampled = dcn_sample(x, offset18, mask9, stride=stride, padding=padding,
                         max_offset=max_offset, interpret=interpret)
    k = weight.shape[0]
    w9c = weight.reshape(k * k * weight.shape[2], weight.shape[3])  # (9C, Co)
    y = jnp.einsum(
        "bhwK,Ko->bhwo", sampled, w9c.astype(sampled.dtype),
        preferred_element_type=jnp.float32,
    ).astype(x.dtype)[:, :, :Wo]
    return y, (x, offset, mask, weight, sampled)


def _mdcn_bwd(stride, padding, max_offset, interpret, res, dy):
    x, offset, mask, weight, sampled = res
    offset18, mask9 = _prep(offset, mask)
    B, Ho, Wo = offset.shape[:3]
    wop = sampled.shape[2]
    k = weight.shape[0]
    ci, co = weight.shape[2], weight.shape[3]
    w9c = weight.reshape(k * k * ci, co)
    dy = jnp.pad(dy, ((0, 0), (0, 0), (0, wop - Wo), (0, 0)))
    mask9p, _ = _pad_wo(mask9, Wo)

    dw9 = jnp.einsum(
        "bhwK,bhwo->Ko", sampled, dy, preferred_element_type=jnp.float32
    ).astype(weight.dtype)
    dweight = dw9.reshape(weight.shape)

    dsampled = jnp.einsum(
        "bhwo,Ko->bhwK", dy, w9c.astype(dy.dtype),
        preferred_element_type=jnp.float32,
    ).astype(sampled.dtype)

    # r5 glue cut: dmask and the dsampled*mask fold both moved INSIDE the
    # kernels. K2 builds P = dsampled @ patchT per tap from the UNMASKED
    # dsampled and reduces it three ways (dh, dw, w one-hots): the w-mode
    # reduce IS dmask_k = <dsampled_k, s_unmasked_k> (exact — no eps
    # division), and the mask scalar multiplies the reduced offset grads.
    # K3 multiplies the mask lane in-kernel. This removes the caller-side
    # selector matmul over two 9C-lane tensors AND the 40-80 MB dsm
    # materialization + its two reads (r5 profile: 22.9 ms @81 GB/s glue).
    g18, dm9 = dcn_offset_grad(
        x, offset18, dsampled, mask9p, stride=stride, padding=padding,
        max_offset=max_offset, interpret=interpret)
    dmask = dm9[:, :, :Wo].reshape(mask.shape).astype(mask.dtype)
    # clamp pass-through: zero gradient where |Δ| exceeded the window
    in_win = (jnp.abs(offset18) <= max_offset).astype(jnp.float32)
    doffset = (
        (g18[:, :, :Wo] * in_win)
        .reshape(offset.shape).astype(offset.dtype)
    )

    dx = dcn_input_grad(dsampled, offset18, mask9, x.shape[1], x.shape[2],
                        stride=stride, padding=padding,
                        max_offset=max_offset,
                        interpret=interpret).astype(x.dtype)
    return dx, doffset, dmask, dweight


modulated_deform_conv_mxu.defvjp(_mdcn_fwd, _mdcn_bwd)
