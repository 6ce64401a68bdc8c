"""Dense vs tile-sparse backbone timing at radar occupancy.

Usage: python tools/tile_bench.py [grid] [n_pillars] [max_tiles]
"""

import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import numpy as np


def main():
    import jax
    import jax.numpy as jnp

    jax.config.update(
        "jax_compilation_cache_dir",
        str(Path(__file__).resolve().parent.parent / ".jax_tpu_cache"),
    )

    from radardistill_tpu.models.backbone_sparse2d import PillarRes18BackBone8x
    from radardistill_tpu.models.backbone_tile_sparse import PillarRes18BackBone8xTileSparse

    grid = int(sys.argv[1]) if len(sys.argv) > 1 else 1440
    n_pillars = int(sys.argv[2]) if len(sys.argv) > 2 else 3000
    max_tiles = int(sys.argv[3]) if len(sys.argv) > 3 else 768

    rng = np.random.RandomState(0)
    bev = np.zeros((1, grid, grid, 32), np.float32)
    mask = np.zeros((1, grid, grid), bool)
    # clustered radar-like occupancy
    centers = rng.randint(0, grid, (n_pillars // 10, 2))
    for cy, cx in centers:
        for _ in range(10):
            y = np.clip(cy + rng.randint(-15, 16), 0, grid - 1)
            x = np.clip(cx + rng.randint(-15, 16), 0, grid - 1)
            mask[0, y, x] = True
    bev[mask] = rng.randn(int(mask.sum()), 32)
    print(f"pillars: {mask.sum()}, tile-occupancy: "
          f"{np.any(mask[0].reshape(grid//32,32,grid//32,32), axis=(1,3)).mean():.3f}")

    bev_j = jnp.asarray(bev, jnp.bfloat16)
    mask_j = jnp.asarray(mask)

    LOOP = 16

    def scanned(fn):
        """Run fn LOOP times inside one device program (tunnel tax is
        ~30-60 ms/call — see CLAUDE.md) and return a scalar."""
        def g(v, x, m):
            def body(acc, _):
                out = fn(v, x + acc * 0, m)  # keep loop iterations live
                return jnp.sum(out.astype(jnp.float32)) * 1e-9, None
            acc, _ = jax.lax.scan(body, jnp.float32(0), None, length=LOOP)
            return acc
        return jax.jit(g)

    def timeit(fn, *args, n=4):
        float(fn(*args))
        ts = []
        for _ in range(n):
            t0 = time.perf_counter()
            float(fn(*args))
            ts.append(time.perf_counter() - t0)
        return float(np.median(ts)) * 1e3 / LOOP

    dense = PillarRes18BackBone8x(dtype=jnp.bfloat16)
    dv = dense.init(jax.random.PRNGKey(0), bev_j, mask_j, False)
    f_d = scanned(lambda v, x, m: dense.apply(v, x, m, False)["x_conv5"])
    print(f"dense backbone:       {timeit(f_d, dv, bev_j, mask_j):8.2f} ms/fwd")

    tile = PillarRes18BackBone8xTileSparse(dtype=jnp.bfloat16, max_tiles=max_tiles)
    tv = tile.init(jax.random.PRNGKey(0), bev_j, mask_j, False)
    f_t = scanned(lambda v, x, m: tile.apply(v, x, m, False)["x_conv5"])
    print(f"tile-sparse backbone: {timeit(f_t, tv, bev_j, mask_j):8.2f} ms/fwd")


if __name__ == "__main__":
    main()
