"""Block-sparse (tile-gather) convolution primitives.

The BASELINE.json north-star: "the spconv SparseEnc backbone is re-expressed
as gather-scatter/masked dense convolutions". The masked-dense path
(backbone_sparse2d.py) is exact but spends full FLOPs on empty space; these
primitives exploit TILE-level sparsity — profitable for the radar branch
(<1% pillar occupancy ⇒ few active tiles) and for inference latency.

Design (static shapes throughout):
  1. `tile_activity`: (B, H, W) mask -> (B, nty, ntx) any-active per tile.
  2. `select_tiles`:  active tiles -> fixed-capacity list of linear tile ids
     (+validity); overflow drops lowest-priority tiles (callers size
     MAX_TILES so overflow means fall back to dense).
  3. `gather_tiles`:  dynamic-slice each tile with a halo ring out of the
     padded feature map -> (T, tile+2h, tile+2h, C) — a batched stencil
     window that convs see as a VALID dense conv (MXU-friendly batch).
  4. `scatter_tiles`: write tile cores back into the dense map (invalid
     tiles routed to a dump row).

A conv stack of receptive growth R runs gather(halo=R) → k VALID convs →
scatter once; no halo exchange needed inside a stage.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def tile_activity(mask: jnp.ndarray, tile: int) -> jnp.ndarray:
    """(B, H, W) bool/float -> (B, H//tile, W//tile) bool."""
    b, h, w = mask.shape
    m = mask.reshape(b, h // tile, tile, w // tile, tile)
    return jnp.any(m.astype(bool), axis=(2, 4))


def select_tiles(act: jnp.ndarray, max_tiles: int):
    """(B, nty, ntx) -> (ids (max_tiles,) int32 linear over B*nty*ntx,
    valid (max_tiles,) bool, overflowed scalar bool)."""
    flat = act.reshape(-1)
    n = flat.shape[0]
    k = min(max_tiles, n)
    score, ids = jax.lax.top_k(flat.astype(jnp.int32), k)
    valid = score > 0
    if k < max_tiles:
        ids = jnp.pad(ids, (0, max_tiles - k))
        valid = jnp.pad(valid, (0, max_tiles - k))
    overflow = jnp.sum(flat) > jnp.sum(valid)
    return ids.astype(jnp.int32), valid, overflow


def _tile_coords(ids, b_shape, tile):
    b, h, w = b_shape
    ntx = w // tile
    nty = h // tile
    per = nty * ntx
    bi = ids // per
    r = ids % per
    ty = r // ntx
    tx = r % ntx
    return bi, ty, tx


def gather_tiles(x: jnp.ndarray, ids, valid, tile: int, halo: int) -> jnp.ndarray:
    """(B, H, W, C) -> (T, tile+2h, tile+2h, C); invalid tiles zeroed."""
    b, h, w, c = x.shape
    xp = jnp.pad(x, ((0, 0), (halo, halo), (halo, halo), (0, 0)))
    bi, ty, tx = _tile_coords(ids, (b, h, w), tile)
    size = tile + 2 * halo

    def one(bi_, ty_, tx_):
        return jax.lax.dynamic_slice(
            xp, (bi_, ty_ * tile, tx_ * tile, jnp.int32(0)), (1, size, size, c)
        )[0]

    patches = jax.vmap(one)(bi, ty, tx)
    return patches * valid[:, None, None, None].astype(patches.dtype)


def scatter_tiles(patches: jnp.ndarray, ids, valid, out_shape) -> jnp.ndarray:
    """(T, tile, tile, C) cores -> dense (B, H, W, C); disjoint set-scatter."""
    b, h, w, c = out_shape
    t, tile, _, _ = patches.shape
    bi, ty, tx = _tile_coords(ids, (b, h, w), tile)
    # flat destination index per patch cell; invalid -> dump row (b*h*w)
    iy = jnp.arange(tile)
    ix = jnp.arange(tile)
    rows = (bi[:, None] * h + ty[:, None] * tile + iy[None, :])  # (T, tile)
    cols = (tx[:, None] * tile + ix[None, :])                    # (T, tile)
    flat = rows[:, :, None] * w + cols[:, None, :]               # (T, tile, tile)
    flat = jnp.where(valid[:, None, None], flat, b * h * w)
    out = jnp.zeros((b * h * w + 1, c), patches.dtype)
    out = out.at[flat.reshape(-1)].set(patches.reshape(-1, c))
    return out[: b * h * w].reshape(b, h, w, c)


def tile_conv_stage(x, mask, conv_fns, tile: int, max_tiles: int, halo: int):
    """Run a stack of VALID convolutions (total receptive growth = halo) on
    active tiles only, scattering the cores back to dense.

    conv_fns: list of fns (patches (T, s, s, C), stats_mask (T, s, s)) ->
    (patches', new_halo_used). Each fn must shrink spatial dims by its own
    receptive growth. Returns the dense output (B, H, W, C').
    """
    b, h, w, _ = x.shape
    act = tile_activity(mask, tile)
    ids, valid, _ = select_tiles(act, max_tiles)
    patches = gather_tiles(x, ids, valid, tile, halo)
    m_patch = gather_tiles(mask[..., None].astype(x.dtype), ids, valid, tile, halo)[..., 0]
    cur_halo = halo
    for fn in conv_fns:
        patches, used = fn(patches, m_patch, cur_halo, valid)
        cur_halo -= used
        if used:
            m_patch = m_patch[:, used:-used, used:-used]
    assert cur_halo == 0, "conv_fns must consume exactly the gathered halo"
    out_c = patches.shape[-1]
    return scatter_tiles(patches, ids, valid, (b, h, w, out_c))
