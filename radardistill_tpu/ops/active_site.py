"""Active-site sparse 2D convolution primitives (gather-scatter spconv).

TPU-native equivalent of spconv's SubMConv2d / SparseConv2d as used by the
reference backbone (pcdet/models/backbones_3d/spconv_backbone_2d.py:9-38):
compute scales with the number of ACTIVE sites, not grid area. At RadarDistill
occupancy (<3% lidar, <0.3% radar pillars on the 1440² nuScenes grid) the
masked-dense formulation moves ~100x more HBM bytes than the features warrant
— this module is the fix (see PERF.md: the train step is bandwidth-bound).

Representation (static shapes throughout):
  - an active set is a fixed-capacity table of SORTED linear site ids
    ``uids (cap,) int32`` where ``uids[i] = y*W + x``; empty slots hold the
    sentinel ``H*W`` and sort to the end. Features ride in ``feats (cap, C)``.
  - neighbor relations are precomputed ONCE per stage as ``(9, cap_out)``
    index tables into the input feature table (+ validity masks) and shared
    by every conv in the stage.

TPU-specific choices (all measured in round 1, see CLAUDE.md):
  - every scatter/gather uses monotone indices (`indices_are_sorted=True`):
    unsorted TPU scatters lower to ~2 GB/s serialized custom-calls;
  - neighbor tables are made strictly monotone via a cummax fill-forward of
    the holes (missing neighbors), with a separate validity mask zeroing the
    gathered rows — the sorted-gather promise then holds;
  - the 3x3 conv itself is one einsum ``(9, n, Ci) x (9, Ci, Co)`` — MXU
    work proportional to capacity, f32 accumulation like XLA's native conv.

All functions are per-sample; vmap over the batch dimension.
"""

from __future__ import annotations

from functools import partial
from typing import Tuple

import jax
import jax.numpy as jnp


def compact_unique(ids: jnp.ndarray, cap: int, sentinel: int):
    """Sort + dedup ids into a fixed-capacity sorted unique table.

    Args:
        ids: (N,) int32 linear ids; invalid entries == ``sentinel`` (which
            must sort after every valid id).
        cap: static output capacity.
        sentinel: the invalid marker (== H*W of the target grid).
    Returns:
        uids: (cap,) sorted unique ids, empty slots = sentinel. If the number
            of unique ids exceeds cap, the LARGEST ids are dropped.
        slot: (N,) position of each (sorted) input id in ``uids``; entries
            for invalid/overflowed ids == cap (safe to use with mode='drop').
        count: () int32 number of unique valid ids (before capping).

    Note: ``slot`` is aligned with ``jnp.sort(ids)``, not the input order —
    callers that need per-input slots must sort their payloads by
    ``jnp.argsort(ids)`` first (the VFE does exactly that, once) and use
    :func:`compact_unique_sorted` to skip the redundant sort.
    """
    return compact_unique_sorted(jnp.sort(ids), cap, sentinel)


def compact_unique_sorted(ids_s: jnp.ndarray, cap: int, sentinel: int):
    """:func:`compact_unique` for ALREADY-SORTED ids (no internal sort)."""
    prev = jnp.concatenate([jnp.full((1,), -1, ids_s.dtype), ids_s[:-1]])
    valid = ids_s < sentinel
    first = (ids_s != prev) & valid
    pos = jnp.cumsum(first.astype(jnp.int32)) - 1  # slot of this id's group
    slot = jnp.where(valid & (pos < cap), pos, cap)
    write_idx = jnp.where(first, slot, cap)  # only first occurrence writes
    uids = jnp.full((cap,), sentinel, jnp.int32).at[write_idx].set(
        ids_s.astype(jnp.int32), mode="drop", indices_are_sorted=True
    )
    count = jnp.sum(first.astype(jnp.int32))
    return uids, slot, count


def site_index_grid(uids: jnp.ndarray, hw: int, cap: int) -> jnp.ndarray:
    """Dense (H*W,) int32 grid mapping linear id -> table row (cap if empty).

    4 bytes/site — tiny next to the feature maps it replaces (e.g. 8.3 MB at
    1440² vs 265 MB for one bf16 C=32 map), and index-only (no gradient).
    """
    return jnp.full((hw,), cap, jnp.int32).at[uids].set(
        jnp.arange(cap, dtype=jnp.int32), mode="drop", indices_are_sorted=True
    )


def conv_neighbor_table(
    out_uids: jnp.ndarray,
    in_grid: jnp.ndarray,
    in_hw: Tuple[int, int],
    out_w: int,
    stride: int,
    cap_in: int,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Neighbor tables for a 3x3 pad-1 conv (stride 1 = submanifold, 2 = down).

    For output site o at (oy, ox), tap k=(ky, kx) reads input
    (oy*stride - 1 + ky, ox*stride - 1 + kx) — torch Conv2d(k=3, p=1)
    cross-correlation orientation (weights load unchanged from the dense
    formulation / converted checkpoints).

    Args:
        out_uids: (cap_out,) sorted output site ids (sentinel = out_hw).
        in_grid: (H_in*W_in,) from :func:`site_index_grid` of the INPUT set.
        in_hw: (H_in, W_in).
        out_w: W of the output grid.
        stride: 1 or 2.
        cap_in: input table capacity.
    Returns:
        nb: (9, cap_out) int32 rows into the input table, strictly
            monotone per tap (holes filled forward) and clipped to
            [0, cap_in-1] — safe for `indices_are_sorted=True` gathers.
        msk: (9, cap_out) bool — True where the neighbor actually exists.
    """
    h_in, w_in = in_hw
    oy = out_uids // out_w
    ox = out_uids % out_w
    out_valid = oy < (h_in // stride)  # sentinel rows have oy == H_out

    # all 9 taps as one (9, cap_out) computation: the per-tap formulation
    # emitted ~9x tiny (cap,) ops per stage, which dominated as fixed
    # per-op overhead at small caps (r2 profile: 374 s32[16k] slices,
    # ~17 ms/step). One batched chain -> a handful of (9, cap) fusions.
    ky = jnp.repeat(jnp.arange(3), 3)[:, None]  # (9, 1)
    kx = jnp.tile(jnp.arange(3), 3)[:, None]
    iy = oy[None, :] * stride - 1 + ky  # (9, cap_out)
    ix = ox[None, :] * stride - 1 + kx
    ok = out_valid[None, :] & (iy >= 0) & (iy < h_in) & (ix >= 0) & (ix < w_in)
    q = jnp.clip(iy * w_in + ix, 0, h_in * w_in - 1)
    # s32 site-index lookup: (9, cap) indices are sorted per tap, not
    # globally — no sorted hint (the 4-byte grid read is cheap anyway).
    nb = in_grid.at[q].get(mode="clip")
    exists = ok & (nb < cap_in)
    # fill holes forward per tap (cummax along the site axis) so the row
    # gathers stay monotone; gathered rows at holes are zeroed by `msk`
    nb_ff = jax.lax.cummax(jnp.where(exists, nb, -1), axis=1)
    return jnp.clip(nb_ff, 0, cap_in - 1), exists


def gather_taps(feats: jnp.ndarray, nb: jnp.ndarray, msk: jnp.ndarray) -> jnp.ndarray:
    """Gather neighbor features -> (9, cap_out, C); missing neighbors are 0."""
    g = feats.at[nb].get(mode="clip", indices_are_sorted=True)
    return g * msk[..., None].astype(feats.dtype)


def conv_neighbor_table_b(
    out_uids: jnp.ndarray,
    in_grid: jnp.ndarray,
    in_hw: Tuple[int, int],
    out_w: int,
    stride: int,
    cap_in: int,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Batched :func:`conv_neighbor_table`: out_uids (B, cap_out), in_grid
    (B, H_in*W_in) -> nb/msk (B, 9, cap_out).

    The site-index lookups run as ONE flat gather over the concatenated
    grids — the vmapped formulation hands XLA a batched gather whose grid
    operand gets an interleaved layout (r3 profile: 6.8 ms/step at 4 GB/s
    for ~550k s32 lookups)."""
    h_in, w_in = in_hw
    b = out_uids.shape[0]
    oy = out_uids // out_w
    ox = out_uids % out_w
    out_valid = oy < (h_in // stride)

    ky = jnp.repeat(jnp.arange(3), 3)[None, :, None]  # (1, 9, 1)
    kx = jnp.tile(jnp.arange(3), 3)[None, :, None]
    iy = oy[:, None, :] * stride - 1 + ky  # (B, 9, cap_out)
    ix = ox[:, None, :] * stride - 1 + kx
    ok = out_valid[:, None, :] & (iy >= 0) & (iy < h_in) & (ix >= 0) & (ix < w_in)
    hw = h_in * w_in
    q = jnp.clip(iy * w_in + ix, 0, hw - 1)
    q_flat = q + (jnp.arange(b, dtype=q.dtype) * hw)[:, None, None]
    nb = in_grid.reshape(-1).at[q_flat].get(mode="clip")
    exists = ok & (nb < cap_in)
    nb_ff = jax.lax.cummax(jnp.where(exists, nb, -1), axis=2)
    return jnp.clip(nb_ff, 0, cap_in - 1), exists


def invert_taps(nb: jnp.ndarray, msk: jnp.ndarray, cap_in: int):
    """Invert per-tap neighbor tables: which OUTPUT references input row r?

    For a fixed tap k the valid entries of ``nb[k]`` are injective (two
    distinct output sites cannot share the same input position at a fixed
    kernel offset), so the transpose of the tap gather is a PERMUTATION, not
    an accumulation — the conv backward can be 9 gathers instead of 9
    scatter-adds (the r3 profile's ~11.5 ms/step bwd-table-scatter class).

    Args:
        nb: (9, cap_out) monotone-per-tap input rows (hole-filled).
        msk: (9, cap_out) True where the neighbor really exists.
        cap_in: input table capacity.
    Returns:
        inv: (9, cap_in) int32 output positions, hole-filled monotone per
            tap (cummax) and clipped to [0, cap_out-1] — valid for sorted
            gathers and for pallas_expand.gather_rows.
        imsk: (9, cap_in) bool — True where input row r is really referenced
            by tap k.
    """
    cap_out = nb.shape[1]
    o_idx = jnp.broadcast_to(jnp.arange(cap_out, dtype=jnp.int32), nb.shape)
    # one flat scatter-min: tap-major positions k*cap_in + nb[k] are globally
    # non-decreasing (nb monotone per tap, nb < cap_in); masked entries write
    # the sentinel cap_out which min() discards against any valid o
    flat_pos = (jnp.arange(9, dtype=nb.dtype)[:, None] * cap_in + nb).reshape(-1)
    vals = jnp.where(msk, o_idx, cap_out).reshape(-1)
    tgt = jnp.full((9 * cap_in,), cap_out, jnp.int32).at[flat_pos].min(
        vals, mode="drop", indices_are_sorted=True
    )
    tgt = tgt.reshape(9, cap_in)
    imsk = tgt < cap_out
    inv_ff = jax.lax.cummax(jnp.where(imsk, tgt, -1), axis=1)
    return jnp.clip(inv_ff, 0, cap_out - 1), imsk


def invert_taps_b(nb: jnp.ndarray, msk: jnp.ndarray, cap_in: int):
    """Batched :func:`invert_taps`: nb/msk (B, 9, cap_out) -> inv/imsk
    (B, 9, cap_in). One flat sorted scatter-min over all samples and taps
    (positions b*9*cap_in + k*cap_in + nb are globally non-decreasing)."""
    b, k, cap_out = nb.shape
    o_idx = jnp.broadcast_to(jnp.arange(cap_out, dtype=jnp.int32), nb.shape)
    seg = jnp.arange(b * k, dtype=nb.dtype).reshape(b, k, 1) * cap_in
    flat_pos = (seg + nb).reshape(-1)
    vals = jnp.where(msk, o_idx, cap_out).reshape(-1)
    tgt = jnp.full((b * k * cap_in,), cap_out, jnp.int32).at[flat_pos].min(
        vals, mode="drop", indices_are_sorted=True
    ).reshape(b, k, cap_in)
    imsk = tgt < cap_out
    inv_ff = jax.lax.cummax(jnp.where(imsk, tgt, -1), axis=2)
    return jnp.clip(inv_ff, 0, cap_out - 1), imsk


@partial(jax.custom_vjp, nondiff_argnums=())
def gather_taps_inv(feats, nb, msk, inv, imsk):
    """:func:`gather_taps` with a gather-formulated backward.

    The autodiff VJP of the tap gather is a scatter-add of (9, cap_out, C)
    rows into (cap_in, C) — measured at 10-46 GB/s (r3 attribution). Because
    each tap is injective (see :func:`invert_taps`) the transpose is exactly
    ``sum_k grad[k, inv[k]] * imsk[k]`` — row gathers, which fuse.
    """
    return gather_taps(feats, nb, msk)


def _gather_taps_inv_fwd(feats, nb, msk, inv, imsk):
    return gather_taps(feats, nb, msk), (inv, imsk, jnp.zeros((0,), feats.dtype))


def _gather_taps_inv_bwd(res, grad):
    inv, imsk, proto = res
    # grad: (9, cap_out, C). Per tap: permutation-gather at the inverse map.
    g = jnp.take_along_axis(grad, inv[..., None], axis=1)  # (9, cap_in, C)
    g = jnp.sum(g * imsk[..., None].astype(grad.dtype), axis=0)
    return g.astype(proto.dtype), None, None, None, None


gather_taps_inv.defvjp(_gather_taps_inv_fwd, _gather_taps_inv_bwd)


def _flat_tap_gather(rows, idx, b, k, n):
    """One 2D gather of (b*k*n,) rows from a flat (b*rows, C) table —
    vmapped/batched tap gathers hand XLA a batch-interleaved table layout
    (CLAUDE.md trap; measured 23 ms/step at 90 GB/s for the bwd direction),
    flat-batching keeps rows contiguous (the densify_batch pattern)."""
    c = rows.shape[-1]
    g = rows.reshape(-1, c).at[idx.reshape(-1)].get(mode="clip")
    return g.reshape(b, k, n, c)


@partial(jax.custom_vjp, nondiff_argnums=())
def gather_taps_inv_b(feats, nb, msk, inv, imsk):
    """Batched :func:`gather_taps_inv`: feats (B, cap_in, C), nb/msk
    (B, 9, cap_out), inv/imsk (B, 9, cap_in) -> (B, 9, cap_out, C).

    Both directions are ONE flat 2D gather (no scatter, no batched-operand
    layouts): fwd gathers neighbor rows, bwd gathers cotangent rows at the
    per-tap inverse maps (a permutation — see :func:`invert_taps`).
    """
    b, cap_in, _ = feats.shape
    k, cap_out = nb.shape[1], nb.shape[2]
    flat_nb = nb + (jnp.arange(b, dtype=nb.dtype) * cap_in)[:, None, None]
    g = _flat_tap_gather(feats, flat_nb, b, k, cap_out)
    return g * msk[..., None].astype(feats.dtype)


def _gather_taps_inv_b_fwd(feats, nb, msk, inv, imsk):
    return (
        gather_taps_inv_b(feats, nb, msk, inv, imsk),
        (inv, imsk, jnp.zeros((0,), feats.dtype)),
    )


def _gather_taps_inv_b_bwd(res, grad):
    inv, imsk, proto = res
    b, k, cap_in = inv.shape
    cap_out = grad.shape[2]
    seg = jnp.arange(b * k, dtype=inv.dtype).reshape(b, k, 1) * cap_out
    g = _flat_tap_gather(grad, inv + seg, b, k, cap_in)  # (B, 9, cap_in, C)
    g = jnp.sum(g * imsk[..., None].astype(grad.dtype), axis=1)
    return g.astype(proto.dtype), None, None, None, None


gather_taps_inv_b.defvjp(_gather_taps_inv_b_fwd, _gather_taps_inv_b_bwd)


def conv3x3_as_b(feats, tap, kernel, bias=None, out_dtype=None):
    """Batched :func:`conv3x3_as`: feats (B, cap_in, Ci), tap =
    (nb, msk, inv, imsk) batched -> (B, cap_out, Co). One flat gather per
    direction + one MXU einsum."""
    nb, msk, inv, imsk = tap
    out_dtype = out_dtype or feats.dtype
    ci, co = kernel.shape[2], kernel.shape[3]
    g = gather_taps_inv_b(feats, nb, msk, inv, imsk)  # (B, 9, n, Ci)
    k = kernel.reshape(9, ci, co).astype(g.dtype)
    y = jnp.einsum("bknc,kcd->bnd", g, k, preferred_element_type=jnp.float32)
    if bias is not None:
        y = y + bias.astype(jnp.float32)
    return y.astype(out_dtype)


def conv3x3_as(
    feats: jnp.ndarray,
    nb: jnp.ndarray,
    msk: jnp.ndarray,
    kernel: jnp.ndarray,
    bias: jnp.ndarray | None = None,
    out_dtype=None,
    inv: jnp.ndarray | None = None,
    imsk: jnp.ndarray | None = None,
) -> jnp.ndarray:
    """3x3 conv on active sites: 9 sorted row-gathers + one MXU einsum.

    kernel: (3, 3, Ci, Co) HWIO — identical layout/params to the dense
    formulation's nn.Conv, so the two backbones share checkpoints.

    With ``inv``/``imsk`` (from :func:`invert_taps`) the feature gradient is
    computed by inverse-map gathers instead of scatter-adds (bit-identical:
    the per-tap transpose is a permutation).
    """
    out_dtype = out_dtype or feats.dtype
    ci, co = kernel.shape[2], kernel.shape[3]
    if inv is not None:
        g = gather_taps_inv(feats, nb, msk, inv, imsk)  # (9, n, Ci)
    else:
        g = gather_taps(feats, nb, msk)
    k = kernel.reshape(9, ci, co).astype(g.dtype)
    y = jnp.einsum("knc,kcd->nd", g, k, preferred_element_type=jnp.float32)
    if bias is not None:
        y = y + bias.astype(jnp.float32)
    return y.astype(out_dtype)


def downsample_active(uids: jnp.ndarray, in_hw: Tuple[int, int], cap_out: int):
    """Output active set of a 3x3 stride-2 pad-1 SparseConv2d.

    An output site is active iff its receptive field touches an active input
    (identical to the masked-dense rule ``max_pool_mask(mask, 3, 2, 1)``,
    models/layers.py:206). Each input (y, x) touches output rows
    {y//2, (y+1)//2} x cols {x//2, (x+1)//2} (≤4 sites); candidates are
    generated per input, deduped, and compacted to ``cap_out``.

    Returns (out_uids (cap_out,), count) — count is the true active count
    pre-capping, so callers/tests can detect overflow.
    """
    h, w = in_hw
    h2, w2 = h // 2, w // 2
    sent_in = h * w
    sent_out = h2 * w2
    valid = uids < sent_in
    y = uids // w
    x = uids % w
    cy0, cy1 = y // 2, (y + 1) // 2
    cx0, cx1 = x // 2, (x + 1) // 2
    cands = []
    for a, cy, dup_y in ((0, cy0, False), (1, cy1, True)):
        for b, cx, dup_x in ((0, cx0, False), (1, cx1, True)):
            ok = valid & (cy < h2) & (cx < w2)
            if dup_y:
                ok = ok & (cy1 != cy0)
            if dup_x:
                ok = ok & (cx1 != cx0)
            cands.append(jnp.where(ok, cy * w2 + cx, sent_out))
    all_c = jnp.concatenate(cands)
    out_uids, _, count = compact_unique(all_c, cap_out, sent_out)
    return out_uids, count


@partial(jax.custom_vjp, nondiff_argnums=(2,))
def _densify_rows(feats, uids, hw_flat):
    """(cap, C) table -> (H*W, C) dense rows, as a GATHER.

    A row scatter of C-wide updates runs at ~13 GB/s on TPU even sorted
    (r2 profile: 46 ms/step in the stride-8 densify); the equivalent
    formulation via the inverse site map — a scalar s32 scatter plus a
    monotone row gather — streams at full bandwidth. The VJP is also a
    gather: uids is unique, so each table row owns exactly one dense cell.
    """
    cap = feats.shape[0]
    inv = site_index_grid(uids, hw_flat, cap)  # (H*W,) cap = empty
    active = inv < cap
    # plain unsorted gather with a zero sentinel row: row gathers are not
    # layout-fragile the way row scatters are, and a cummax fill-forward to
    # earn the sorted-gather hint costs more than it saves at H*W ~ 2M
    # (measured: tools/scatter_bench.py invgath beats the sorted variant)
    feats_z = jnp.concatenate([feats, jnp.zeros((1,) + feats.shape[1:], feats.dtype)])
    rows = feats_z.at[inv].get(mode="clip")
    return rows, active


def _densify_rows_fwd(feats, uids, hw_flat):
    out = _densify_rows(feats, uids, hw_flat)
    return out, uids


def _densify_rows_bwd(hw_flat, uids, grads):
    g_dense, _ = grads  # mask output is boolean: no gradient
    valid = uids < hw_flat
    g = g_dense.at[jnp.clip(uids, 0, hw_flat - 1)].get(
        mode="clip", indices_are_sorted=True
    )
    return g * valid[:, None].astype(g.dtype), None


_densify_rows.defvjp(_densify_rows_fwd, _densify_rows_bwd)


def densify(feats: jnp.ndarray, uids: jnp.ndarray, hw: Tuple[int, int]):
    """Expand a feature table to the dense (H, W, C) grid (+ (H, W) mask).

    Gather-formulated in both directions (see :func:`_densify_rows`)."""
    h, w = hw
    c = feats.shape[-1]
    dense, active = _densify_rows(feats, uids, h * w)
    return dense.reshape(h, w, c), active.reshape(h, w)


@partial(jax.custom_vjp, nondiff_argnums=(2,))
def _densify_rows_b(feats, uids, hw_flat):
    """Batched :func:`_densify_rows` over (B, cap, C) tables as ONE flat 2D
    gather.

    vmapping the per-sample densify hands XLA a batched gather whose table
    operand gets a batch-interleaved {2,0,1} layout (plus 4x lane padding at
    C=32) — measured 8 GB/s / 141 ms/step at bs4 (r2 profile, fusion.7640).
    Flattening (B, cap+1, C) -> (B*(cap+1), C) and offsetting the indices
    keeps the table rows contiguous; the one relayout copy this may insert
    is full-bandwidth."""
    from .pallas_expand import BLK, expand_rows

    b, cap, c = feats.shape
    feats_z = jnp.concatenate(
        [feats, jnp.zeros((b, 1, c), feats.dtype)], axis=1
    ).reshape(b * (cap + 1), c)
    inv = jax.vmap(lambda u: site_index_grid(u, hw_flat, cap))(uids)  # (B, hw)
    flat_idx = inv + jnp.arange(b, dtype=inv.dtype)[:, None] * (cap + 1)
    # pad each sample's cells to a block multiple with -1 (zero rows) so
    # expansion blocks never straddle samples (monotone-range invariant)
    pad = (-hw_flat) % BLK
    if pad:
        flat_idx = jnp.concatenate(
            [flat_idx, jnp.full((b, pad), -1, flat_idx.dtype)], axis=1
        )
    rows = expand_rows(feats_z, flat_idx.reshape(-1)).reshape(b, hw_flat + pad, c)
    rows = rows[:, :hw_flat]
    return rows, inv < cap


def _densify_rows_b_fwd(feats, uids, hw_flat):
    return _densify_rows_b(feats, uids, hw_flat), uids


def _densify_rows_b_bwd(hw_flat, uids, grads):
    g_dense, _ = grads  # (B, hw, C)
    b, cap = uids.shape
    c = g_dense.shape[-1]
    valid = uids < hw_flat
    flat_u = jnp.clip(uids, 0, hw_flat - 1) + jnp.arange(
        b, dtype=uids.dtype
    )[:, None] * hw_flat
    g = g_dense.reshape(b * hw_flat, c).at[flat_u.reshape(-1)].get(
        mode="clip"
    ).reshape(b, cap, c)
    return g * valid[..., None].astype(g.dtype), None


_densify_rows_b.defvjp(_densify_rows_b_fwd, _densify_rows_b_bwd)


def densify_batch(feats: jnp.ndarray, uids: jnp.ndarray, hw: Tuple[int, int]):
    """(B, cap, C) tables -> (B, H, W, C) dense + (B, H, W) mask (flat
    batched gather; see :func:`_densify_rows_b`)."""
    h, w = hw
    b, _, c = feats.shape
    rows, active = _densify_rows_b(feats, uids, h * w)
    return rows.reshape(b, h, w, c), active.reshape(b, h, w)


@partial(jax.custom_vjp, nondiff_argnums=(2,))
def _densify_packed_rows_b(feats, uids, hw):
    """Batched packed densify as one flat gather (see _densify_rows_b)."""
    h, w = hw
    b, cap, c = feats.shape
    feats_z = jnp.concatenate(
        [feats, jnp.zeros((b, 1, c), feats.dtype)], axis=1
    ).reshape(b * (cap + 1), c)
    inv = jax.vmap(lambda u: site_index_grid(u, h * w, cap))(uids)
    inv_p = (
        inv.reshape(b, h // 2, 2, w // 2, 2)
        .transpose(0, 1, 3, 2, 4)
        .reshape(b, h // 2, w // 2, 4)
    )
    flat_idx = inv_p + jnp.arange(b, dtype=inv.dtype)[:, None, None, None] * (cap + 1)
    rows = feats_z.at[flat_idx.reshape(-1)].get(mode="clip").reshape(
        b, h // 2, w // 2, 4, c
    )
    return rows, (inv < cap).reshape(b, h, w)


def _densify_packed_rows_b_fwd(feats, uids, hw):
    return _densify_packed_rows_b(feats, uids, hw), uids


def _densify_packed_rows_b_bwd(hw, uids, grads):
    g_packed, _ = grads  # (B, h2, w2, 4, C)
    h, w = hw
    b, cap = uids.shape
    c = g_packed.shape[-1]
    valid = uids < h * w
    u = jnp.clip(uids, 0, h * w - 1)
    y, x = u // w, u % w
    packed_flat = (
        ((y // 2) * (w // 2) + x // 2) * 4 + (y % 2) * 2 + (x % 2)
        + jnp.arange(b, dtype=uids.dtype)[:, None] * ((h // 2) * (w // 2) * 4)
    )
    g = g_packed.reshape(b * (h // 2) * (w // 2) * 4, c).at[
        packed_flat.reshape(-1)
    ].get(mode="clip").reshape(b, cap, c)
    return g * valid[..., None].astype(g.dtype), None


_densify_packed_rows_b.defvjp(_densify_packed_rows_b_fwd, _densify_packed_rows_b_bwd)


def densify_packed_batch(feats, uids, hw: Tuple[int, int]):
    """(B, cap, C) tables -> (B, H/2, W/2, 4*C) packed + (B, H, W) mask."""
    h, w = hw
    b, _, c = feats.shape
    rows, mask = _densify_packed_rows_b(feats, uids, hw)
    return rows.reshape(b, h // 2, w // 2, 4 * c), mask


def packed_addr(uids, h, w):
    """Space-to-depth flat address of linear site ids (voxelize.packed_key
    twin at the (h, w) grid): parent-major, phase = (y%2)*2 + x%2. The
    sentinel h*w maps to itself (drops out of scatters)."""
    y = uids // w
    x = uids - y * w
    addr = (((y >> 1) * (w >> 1) + (x >> 1)) << 2) + ((y & 1) << 1) + (x & 1)
    return jnp.where(uids >= h * w, h * w, addr)


@partial(jax.custom_vjp, nondiff_argnums=(2,))
def _densify_packed_direct_rows_b(feats, uids, hw):
    """Packed densify for PACKED-ORDER tables (uids sorted by packed_addr,
    id values still linear — vfe.encode_table packed_order=True).

    The inverse site map is scattered DIRECTLY at packed addresses (monotone
    under the packed sort, so the scatter keeps its sorted hint) and the row
    gather lands straight in the (h2, w2, 4, C) layout: no 16.6 MB (H, W)
    index transpose and no pack_mask transpose downstream (r5 profile:
    ~5 ms/step of relayouts around the entry densify at 1440²)."""
    h, w = hw
    b, cap, c = feats.shape
    feats_z = jnp.concatenate(
        [feats, jnp.zeros((b, 1, c), feats.dtype)], axis=1
    ).reshape(b * (cap + 1), c)
    addr = packed_addr(uids, h, w)  # (B, cap) monotone rows
    inv = jax.vmap(
        lambda a: jnp.full((h * w,), cap, jnp.int32).at[a].set(
            jnp.arange(cap, dtype=jnp.int32), mode="drop",
            indices_are_sorted=True)
    )(addr)  # (B, h*w) in PACKED-flat order
    flat_idx = inv + jnp.arange(b, dtype=inv.dtype)[:, None] * (cap + 1)
    rows = feats_z.at[flat_idx.reshape(-1)].get(mode="clip").reshape(
        b, h // 2, w // 2, 4, c
    )
    return rows, (inv < cap).reshape(b, h // 2, w // 2, 4)


def _densify_packed_direct_rows_b_fwd(feats, uids, hw):
    return _densify_packed_direct_rows_b(feats, uids, hw), uids


def _densify_packed_direct_rows_b_bwd(hw, uids, grads):
    g_packed, _ = grads  # (B, h2, w2, 4, C)
    h, w = hw
    b, cap = uids.shape
    c = g_packed.shape[-1]
    valid = uids < h * w
    addr = jnp.clip(packed_addr(uids, h, w), 0, h * w - 1)
    flat = addr + jnp.arange(b, dtype=addr.dtype)[:, None] * (h * w)
    # monotone: addr is sorted per sample (packed-order table), clip keeps
    # the trailing sentinel run at h*w-1, batch offsets are increasing
    g = g_packed.reshape(b * h * w, c).at[flat.reshape(-1)].get(
        mode="clip", indices_are_sorted=True
    ).reshape(b, cap, c)
    return g * valid[..., None].astype(g.dtype), None


_densify_packed_direct_rows_b.defvjp(
    _densify_packed_direct_rows_b_fwd, _densify_packed_direct_rows_b_bwd)


def densify_packed_direct_batch(feats, uids, hw: Tuple[int, int]):
    """PACKED-ORDER (B, cap, C) tables -> (B, H/2, W/2, 4*C) packed dense +
    (B, H/2, W/2, 4) packed mask (phase-major — pack_mask layout)."""
    h, w = hw
    b, _, c = feats.shape
    rows, mask_p = _densify_packed_direct_rows_b(feats, uids, hw)
    return rows.reshape(b, h // 2, w // 2, 4 * c), mask_p


@partial(jax.custom_vjp, nondiff_argnums=(2,))
def _densify_packed_rows(feats, uids, hw):
    """(cap, C) table -> (H/2, W/2, 4, C) space-to-depth-packed dense grid.

    The packed variant of :func:`_densify_rows` for S2D consumers: the
    gather WRITES directly in the packed layout (phase = (y%2)*2 + x%2,
    matching backbone_s2d.space_to_depth), so XLA has no downstream
    transpose to fuse into the gather — in-model, that fusion degraded the
    plain row gather to 8 GB/s (r2 profile, 141 ms/step at bs4)."""
    h, w = hw
    cap = feats.shape[0]
    inv = site_index_grid(uids, h * w, cap)
    inv_p = (
        inv.reshape(h // 2, 2, w // 2, 2)
        .transpose(0, 2, 1, 3)
        .reshape(h // 2, w // 2, 4)
    )
    feats_z = jnp.concatenate(
        [feats, jnp.zeros((1,) + feats.shape[1:], feats.dtype)]
    )
    rows = feats_z.at[inv_p].get(mode="clip")  # (h2, w2, 4, C)
    active = inv < cap
    return rows, active.reshape(h, w)


def _densify_packed_fwd(feats, uids, hw):
    return _densify_packed_rows(feats, uids, hw), uids


def _densify_packed_bwd(hw, uids, grads):
    g_packed, _ = grads  # (h2, w2, 4, C); mask output: no gradient
    h, w = hw
    valid = uids < h * w
    u = jnp.clip(uids, 0, h * w - 1)
    y, x = u // w, u % w
    g = g_packed[y // 2, x // 2, (y % 2) * 2 + (x % 2)]
    return g * valid[:, None].astype(g.dtype), None


_densify_packed_rows.defvjp(_densify_packed_fwd, _densify_packed_bwd)


def densify_packed(feats: jnp.ndarray, uids: jnp.ndarray, hw: Tuple[int, int]):
    """Table -> (H/2, W/2, 4*C) packed dense grid + (H, W) mask (the fused
    equivalent of densify + backbone_s2d.space_to_depth)."""
    h, w = hw
    c = feats.shape[-1]
    rows, mask = _densify_packed_rows(feats, uids, hw)
    return rows.reshape(h // 2, w // 2, 4 * c), mask


def sparsify(bev: jnp.ndarray, mask: jnp.ndarray, cap: int):
    """Dense (H, W, C) + (H, W) mask -> (feats (cap, C), uids (cap,)).

    Test/interop helper (the production path never materializes the dense
    grid at fine strides). Active sites beyond ``cap`` are dropped in
    id order (largest first).
    """
    h, w, c = bev.shape
    ids = jnp.where(mask.reshape(-1), jnp.arange(h * w, dtype=jnp.int32), h * w)
    uids, _, count = compact_unique(ids, cap, h * w)
    feats = bev.reshape(h * w, c).at[jnp.clip(uids, 0, h * w - 1)].get(
        mode="clip", indices_are_sorted=True
    )
    feats = feats * (uids < h * w)[:, None].astype(feats.dtype)
    return feats, uids, count
