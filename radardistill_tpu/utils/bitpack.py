"""Bool-grid bit packing for host->device transfer (VERDICT r4 #2).

The production host loop is transfer-bandwidth-bound through the axon
tunnel (~36 MB/s measured, tools/prod_step_bench.py); bool grids ship 1
byte/cell. Pack host-side along the last (W) axis with numpy's default
MSB-first bit order, unpack device-side with three elementwise ops that XLA
fuses into the consumer.
"""

from __future__ import annotations

import numpy as np


def pack_bool_np(m: np.ndarray) -> np.ndarray:
    """(…, W) bool -> (…, ceil(W/8)) uint8, MSB-first (np.packbits)."""
    return np.packbits(m, axis=-1)


def unpack_bool_jnp(p, w: int):
    """(…, ceil(W/8)) uint8 -> (…, w) bool on device (matches pack_bool_np)."""
    import jax.numpy as jnp

    shifts = jnp.arange(7, -1, -1, dtype=jnp.uint8)  # MSB first
    bits = (p[..., :, None] >> shifts) & jnp.uint8(1)
    return bits.reshape(*p.shape[:-1], p.shape[-1] * 8)[..., :w].astype(bool)
