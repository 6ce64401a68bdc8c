"""Pallas sorted-table expansion kernel vs the reference gather.

Runs the REAL kernel (interpret mode on CPU) over adversarial index
patterns: sentinel holes, empty blocks, blocks at the table end, and the
exact densify_batch index construction.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from radardistill_tpu.ops import active_site as asx
from radardistill_tpu.ops.pallas_expand import BLK, expand_sorted_rows


def _reference(table, inv):
    r = table.shape[0]
    safe = jnp.clip(inv, 0, r - 1)
    rows = table.at[safe].get(mode="clip")
    ok = (inv >= 0) & (inv < r)
    return rows * ok[:, None].astype(table.dtype)


@pytest.mark.parametrize("occupancy", [0.0, 0.05, 0.8])
def test_expand_matches_reference(occupancy):
    rng = np.random.RandomState(0)
    m = 4 * BLK
    r = 700  # not a BLK multiple: exercises table padding
    c = 32
    table = rng.randn(r, c).astype(np.float32)
    # monotone active rows within each block, sentinel elsewhere
    inv = np.full((m,), -1, np.int32)
    k = int(m * occupancy)
    if k:
        cells = np.sort(rng.choice(m, k, replace=False))
        inv[cells] = np.sort(rng.choice(r, k, replace=True))
        # enforce the monotone invariant the caller guarantees
        inv[cells] = np.sort(inv[cells])
        # clamp per-block spans to < BLK rows (the caller's invariant)
        for blk in range(m // BLK):
            sl = inv[blk * BLK: (blk + 1) * BLK]
            act = sl >= 0
            if act.any():
                lo = sl[act].min()
                sl[act] = np.minimum(sl[act], lo + BLK - 1)
                inv[blk * BLK: (blk + 1) * BLK] = sl
    got = expand_sorted_rows(jnp.asarray(table), jnp.asarray(inv), interpret=True)
    want = _reference(jnp.asarray(table), jnp.asarray(inv))
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), rtol=0, atol=0)


def test_densify_batch_pallas_path_matches_vmapped(monkeypatch):
    """Force the pallas path (interpret) through densify_batch and compare
    against the per-sample vmapped densify."""
    from radardistill_tpu.ops import pallas_expand

    monkeypatch.setattr(
        pallas_expand, "expand_rows",
        lambda table, inv: pallas_expand.expand_sorted_rows(
            table, inv, interpret=True),
    )
    rng = np.random.RandomState(3)
    h = w = 48  # hw = 2304 (not a BLK multiple: exercises cell padding)
    b, c, cap = 2, 8, 64
    feats = jnp.asarray(rng.randn(b, cap, c).astype(np.float32))
    uids_np = np.full((b, cap), h * w, np.int32)
    for i in range(b):
        k = rng.randint(5, cap)
        uids_np[i, :k] = np.sort(rng.choice(h * w, k, replace=False))
    uids = jnp.asarray(uids_np)

    got_bev, got_mask = asx.densify_batch(feats, uids, (h, w))
    want_bev, want_mask = jax.vmap(
        lambda f, u: asx.densify(f, u, (h, w))
    )(feats, uids)
    np.testing.assert_allclose(
        np.asarray(got_bev), np.asarray(want_bev), rtol=0, atol=0
    )
    np.testing.assert_array_equal(np.asarray(got_mask), np.asarray(want_mask))


# ---------------------------------------------------------------------------
# Windowed gather (generalized expand): tap-table spans up to (n_win-1)*BLK
# ---------------------------------------------------------------------------


def _reference_rows(table, idx):
    r = table.shape[0]
    safe = jnp.clip(idx, 0, r - 1)
    rows = table.at[safe].get(mode="clip")
    ok = (idx >= 0) & (idx < r)
    return rows * ok[:, None].astype(table.dtype)


@pytest.mark.parametrize("n_win,r", [(2, 700), (4, 1800), (8, 4096), (3, 300)])
def test_gather_rows_windowed_matches_reference(n_win, r):
    from radardistill_tpu.ops.pallas_expand import gather_rows_windowed, window_overflow

    rng = np.random.RandomState(n_win)
    m = 6 * BLK
    c = 24
    table = rng.randn(r, c).astype(np.float32)
    idx = np.full((m,), -(2 ** 30), np.int32)  # segment-pad sentinel
    for blk in range(m // BLK):
        k = rng.randint(0, BLK + 1)
        if not k:
            continue
        cells = np.sort(rng.choice(BLK, k, replace=False)) + blk * BLK
        lo = rng.randint(0, max(r - 1, 1))
        # spans up to the full guaranteed window (alignment slack included)
        hi = min(lo + (n_win - 1) * BLK - 1, r - 1)
        idx[cells] = np.sort(rng.randint(lo, hi + 1, size=k))
    jt, ji = jnp.asarray(table), jnp.asarray(idx)
    assert int(window_overflow(ji, r, n_win)) == 0
    got = gather_rows_windowed(jt, ji, n_win, interpret=True)
    want = _reference_rows(jt, ji)
    np.testing.assert_array_equal(np.asarray(got), np.asarray(want))


def test_gather_rows_windowed_span_violation_is_counted():
    from radardistill_tpu.ops.pallas_expand import gather_rows_windowed, window_overflow

    r, c, n_win = 4096, 8, 2
    table = np.ones((r, c), np.float32)
    idx = np.full((BLK,), -(2 ** 30), np.int32)
    idx[0], idx[-1] = 0, 3000  # span >> (n_win-1)*BLK
    ji = jnp.asarray(idx)
    assert int(window_overflow(ji, r, n_win)) > 0
    got = gather_rows_windowed(jnp.asarray(table), ji, n_win, interpret=True)
    # the in-window entry is exact; the out-of-window one is (wrongly) zero —
    # exactly what the overflow counter guards against
    assert np.asarray(got)[0].sum() == c
    assert np.asarray(got)[-1].sum() == 0


def test_gather_rows_windowed_full_table_mode():
    """n_win covering the whole (padded) table: any monotone-per-block idx."""
    from radardistill_tpu.ops.pallas_expand import gather_rows_windowed

    rng = np.random.RandomState(3)
    r, c = 900, 16
    n_win = -(-r // BLK) + 1
    table = rng.randn(r, c).astype(np.float32)
    m = 4 * BLK
    idx = np.sort(rng.randint(-5, r + 5, size=m)).astype(np.int32)
    idx = np.where(idx < 0, -(2 ** 30), idx)
    got = gather_rows_windowed(jnp.asarray(table), jnp.asarray(idx), n_win, interpret=True)
    want = _reference_rows(jnp.asarray(table), jnp.asarray(idx))
    np.testing.assert_array_equal(np.asarray(got), np.asarray(want))
