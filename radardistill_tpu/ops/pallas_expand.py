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
