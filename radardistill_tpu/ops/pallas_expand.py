"""Pallas TPU kernel: expand a SORTED sparse row table to a dense grid.

The densify step (sparse site table -> dense BEV grid) is the inverse-index
gather ``dense[cell] = table[inv[cell]]``. Row-indexed gathers/scatters on
TPU cost ~50-130 ns PER ROW regardless of row width (measured r2:
the 8.3M-cell stride-1 grid build runs 130-154 ms no matter the
formulation, scatter direction 85 ms — tools/scatter_bench.py +
/tmp/dens_bisect*). This kernel removes the per-row machinery entirely:

  - ``inv`` is MONOTONE over active cells (site ids are sorted), so each
    block of BLK consecutive cells reads a CONTIGUOUS table row range of
    at most BLK rows;
  - per block, fetch two 512-aligned table windows covering that range and
    compute ``out = onehot(inv - base) @ rows`` — one (BLK, 2*BLK) x
    (2*BLK, C) MXU matmul. Sentinel cells (inv = zero-row) fall outside
    the window -> all-zero one-hot row -> exact zeros.
  - bit-exact with the gather: each one-hot row has exactly one nonzero,
    so the f32-accumulated dot of a single bf16 value round-trips.

Constraints handled by the wrapper: cells padded to a BLK multiple, table
rows padded to a 512 multiple, blocks must not straddle per-sample table
ranges (callers pass per-sample-flattened inv, and BLK divides H*W).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

BLK = 512          # output cells per program
WIN = 2 * BLK      # table rows visible per program (two aligned windows)


def _expand_kernel(starts_ref, inv_ref, tab_a, tab_b, out_ref):
    i = pl.program_id(0)
    base = starts_ref[i] * BLK
    rel = inv_ref[:] - base                  # (BLK, 1); active in [0, WIN)
    rows = jnp.concatenate([tab_a[:], tab_b[:]], axis=0)  # (WIN, C)
    iota = jax.lax.broadcasted_iota(jnp.int32, (BLK, WIN), 1)
    onehot = (rel == iota).astype(rows.dtype)  # (BLK,1) bcast vs (BLK,WIN)
    out_ref[:] = jnp.dot(
        onehot, rows, preferred_element_type=jnp.float32
    ).astype(out_ref.dtype)


@functools.partial(jax.jit, static_argnames=("interpret",))
def expand_sorted_rows(table, inv, interpret=False):
    """dense (M, C) = table[inv] for MONOTONE-per-block inv.

    Args:
        table: (R, C) rows. The caller guarantees that for every aligned
            block of BLK cells, the active ``inv`` values span < BLK rows
            (true when inv is monotone over the block's active cells).
        inv: (M,) int32; out-of-table values (sentinel) produce zero rows.
            M must be a multiple of BLK.
    """
    m, = inv.shape
    r, c = table.shape
    assert m % BLK == 0, m
    n_blocks = m // BLK
    r_pad = (-r) % BLK
    if r + r_pad < 2 * BLK:  # starts+1 must always be a valid block
        r_pad = 2 * BLK - r
    if r_pad:
        table = jnp.concatenate(
            [table, jnp.zeros((r_pad, c), table.dtype)], axis=0
        )
    r_full = table.shape[0]

    inv_b = inv.reshape(n_blocks, BLK)
    active = (inv_b >= 0) & (inv_b < r)
    row_min = jnp.min(jnp.where(active, inv_b, r_full), axis=1)
    starts = jnp.clip(row_min // BLK, 0, r_full // BLK - 2).astype(jnp.int32)
    # (m, 1) column: block (BLK, 1) satisfies the (8,128)-or-full tiling rule
    inv_col = inv.reshape(m, 1)

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(n_blocks,),
        in_specs=[
            pl.BlockSpec((BLK, 1), lambda i, s: (i, 0)),
            pl.BlockSpec((BLK, c), lambda i, s: (s[i], 0)),
            pl.BlockSpec((BLK, c), lambda i, s: (s[i] + 1, 0)),
        ],
        out_specs=pl.BlockSpec((BLK, c), lambda i, s: (i, 0)),
    )
    return pl.pallas_call(
        _expand_kernel,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((m, c), table.dtype),
        interpret=interpret,
    )(starts, inv_col, table, table)


def expand_rows(table, inv):
    """Dispatcher: Pallas on TPU, reference gather elsewhere (tests/CPU).

    Exact-equality is asserted by tests/test_pallas_expand.py via
    interpret mode."""
    platform = jax.devices()[0].platform
    if platform == "tpu":
        return expand_sorted_rows(table, inv)
    # reference semantics (also what the VJP of the caller assumes)
    cap = table.shape[0]
    safe = jnp.clip(inv, 0, cap - 1)
    rows = table.at[safe].get(mode="clip")
    ok = (inv >= 0) & (inv < cap)
    return rows * ok[:, None].astype(table.dtype)


# ---------------------------------------------------------------------------
# Generalized windowed gather: ``expand_sorted_rows`` with a caller-chosen
# window size. Used for the active-site conv tap gathers (fwd) and their
# transposed scatter-adds (bwd, via per-tap inverse maps) — the AS backbone's
# per-row gather/scatter wall (PERF.md r3 attribution: ~11.5 ms/step of
# bwd table scatters at 10-46 GB/s, plus the fwd gathers inside the einsum
# class). Tap neighbor tables are monotone per (sample, tap) segment but can
# jump by a full grid row between consecutive sites, so the 2-block window
# of ``expand_sorted_rows`` is not enough; the span is still bounded by grid
# geometry (ops/active_site.py tap_windows derives the bound), so the caller
# passes a static ``n_win``.
# ---------------------------------------------------------------------------


def _gather_win_kernel(n_win, starts_ref, idx_ref, *refs):
    tabs, out_ref = refs[:-1], refs[-1]
    i = pl.program_id(0)
    base = starts_ref[i] * BLK
    rel = idx_ref[:] - base                       # (BLK, 1)
    iota = jax.lax.broadcasted_iota(jnp.int32, (BLK, BLK), 1)
    acc = jnp.zeros((BLK, out_ref.shape[-1]), jnp.float32)
    for j in range(n_win):
        onehot = ((rel - j * BLK) == iota).astype(tabs[j].dtype)
        acc += jnp.dot(onehot, tabs[j][:], preferred_element_type=jnp.float32)
    out_ref[:] = acc.astype(out_ref.dtype)


@functools.partial(jax.jit, static_argnames=("n_win", "interpret"))
def gather_rows_windowed(table, idx, n_win, interpret=False):
    """rows (M, C) = table[idx] for idx MONOTONE (among active entries) per
    aligned BLK block, with active spans bounded by (n_win - 1) * BLK.

    Args:
        table: (R, C) rows.
        idx: (M,) int32, M % BLK == 0. Entries outside [0, R) (negative
            sentinels, sample-segment padding) produce exact zero rows.
        n_win: static window size in BLK blocks; for every aligned block of
            BLK entries, max(active idx) - min(active idx) must be
            < (n_win - 1) * BLK (floor-alignment of the start eats the rest).
            Violations produce silently wrong (zero) rows — callers derive
            n_win from grid geometry (active_site.tap_windows) and monitor
            with :func:`window_overflow`.
    """
    m, = idx.shape
    r, c = table.shape
    assert m % BLK == 0, m
    n_blocks = m // BLK
    r_pad = (-r) % BLK
    if r + r_pad < (n_win + 1) * BLK:  # starts + n_win - 1 must be valid blocks
        r_pad = (n_win + 1) * BLK - r
    if r_pad:
        table = jnp.concatenate(
            [table, jnp.zeros((r_pad, c), table.dtype)], axis=0
        )
    r_full = table.shape[0]

    idx_b = idx.reshape(n_blocks, BLK)
    active = (idx_b >= 0) & (idx_b < r)
    row_min = jnp.min(jnp.where(active, idx_b, r_full), axis=1)
    starts = jnp.clip(row_min // BLK, 0, r_full // BLK - n_win).astype(jnp.int32)
    idx_col = idx.reshape(m, 1)

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(n_blocks,),
        in_specs=[pl.BlockSpec((BLK, 1), lambda i, s: (i, 0))]
        + [
            pl.BlockSpec((BLK, c), lambda i, s, j=j: (s[i] + j, 0))
            for j in range(n_win)
        ],
        out_specs=pl.BlockSpec((BLK, c), lambda i, s: (i, 0)),
    )
    return pl.pallas_call(
        functools.partial(_gather_win_kernel, n_win),
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((m, c), table.dtype),
        interpret=interpret,
    )(starts, idx_col, *([table] * n_win))


def gather_rows(table, idx, n_win):
    """Dispatcher: Pallas windowed gather on TPU, reference take elsewhere."""
    platform = jax.devices()[0].platform
    if platform == "tpu":
        return gather_rows_windowed(table, idx, n_win)
    cap = table.shape[0]
    rows = table.at[jnp.clip(idx, 0, cap - 1)].get(mode="clip")
    ok = (idx >= 0) & (idx < cap)
    return rows * ok[:, None].astype(table.dtype)


def window_overflow(idx, r, n_win):
    """Count of active entries falling outside their block's window — the
    monitoring counterpart of ``gather_rows_windowed``'s span precondition
    (summed into the backbone's ``as_overflow`` counter; nonzero means
    tap_windows' bound was violated and results are wrong). Mirrors the
    kernel's padding + start computation exactly."""
    m, = idx.shape
    r_pad = (-r) % BLK
    if r + r_pad < (n_win + 1) * BLK:
        r_pad = (n_win + 1) * BLK - r
    r_full = r + r_pad
    idx_b = idx.reshape(m // BLK, BLK)
    active = (idx_b >= 0) & (idx_b < r)
    row_min = jnp.min(jnp.where(active, idx_b, r_full), axis=1)
    start = jnp.clip(row_min // BLK, 0, r_full // BLK - n_win)
    out = active & (idx_b - start[:, None] * BLK >= n_win * BLK)
    return jnp.sum(out.astype(jnp.int32))
