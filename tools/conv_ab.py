"""A/B the teacher S2D stage-1 conv shape on TPU: (2,720,720,128)x(3,3,128,128).

The r3 trace shows these convs at ~47 TF/s while the 360²/180² conv
fusions run at ~158 TF/s — this harness isolates the shape and tries
alternative formulations. Scan-amortized in-device loops (CLAUDE.md: the
tunnel's ~30-60 ms call tax makes single-call micro-timings noise), carry
threaded through the body so XLA cannot hoist it.

Usage: JAX_COMPILATION_CACHE_DIR=.jax_tpu_cache python tools/conv_ab.py
"""

import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import numpy as np

B, H, W, C = 2, 720, 720, 128
FLOPS = B * H * W * C * C * 9 * 2  # per conv application
SCAN = 8


def main():
    import jax
    import jax.numpy as jnp

    jax.config.update(
        "jax_compilation_cache_dir",
        str(Path(__file__).resolve().parent.parent / ".jax_tpu_cache"),
    )

    rng = np.random.RandomState(0)
    k = jnp.asarray(rng.randn(3, 3, C, C) * 0.05, jnp.bfloat16)

    def timed(name, build_x, fn, n=4):
        x0 = build_x()

        def multi(x0):
            def body(x, _):
                y = fn(x)
                # renormalize so values stay finite over the scan
                return (y * (0.05 / jnp.maximum(jnp.mean(jnp.abs(y)), 1e-3))).astype(x0.dtype), ()
            xN, _ = jax.lax.scan(body, x0, None, length=SCAN)
            return jnp.sum(xN.astype(jnp.float32))

        f = jax.jit(multi)
        _ = float(f(x0))
        ts = []
        for _ in range(n):
            t0 = time.perf_counter()
            _ = float(f(x0))
            ts.append(time.perf_counter() - t0)
        ms = float(np.median(ts)) * 1e3 / SCAN
        print(f"{name:36s} {ms:7.2f} ms  {FLOPS / ms / 1e9:7.1f} TF/s")

    mk_nhwc = lambda: jnp.asarray(rng.randn(B, H, W, C) * 0.05, jnp.bfloat16)

    timed("nhwc lax.conv (baseline)", mk_nhwc, lambda x: jax.lax.conv_general_dilated(
        x, k, (1, 1), ((1, 1), (1, 1)), dimension_numbers=("NHWC", "HWIO", "NHWC")))

    timed("nhwc batch-merged (1,1440,720,C)",
          lambda: jnp.asarray(rng.randn(1, 2 * H, W, C) * 0.05, jnp.bfloat16),
          lambda x: jax.lax.conv_general_dilated(
              x, k, (1, 1), ((1, 1), (1, 1)),
              dimension_numbers=("NHWC", "HWIO", "NHWC")))

    def nchw(x):
        kt = jnp.transpose(k, (3, 2, 0, 1))  # OIHW
        return jax.lax.conv_general_dilated(
            x, kt, (1, 1), ((1, 1), (1, 1)),
            dimension_numbers=("NCHW", "OIHW", "NCHW"))

    timed("nchw lax.conv",
          lambda: jnp.asarray(rng.randn(B, C, H, W) * 0.05, jnp.bfloat16), nchw)

    def shifts(x):
        # 9 shifted (B*H*W, C) @ (C, C) matmuls accumulated in f32
        xp = jnp.pad(x, ((0, 0), (1, 1), (1, 1), (0, 0)))
        acc = jnp.zeros(x.shape[:3] + (C,), jnp.float32)
        for dy in range(3):
            for dx in range(3):
                sl = jax.lax.dynamic_slice(xp, (0, dy, dx, 0), x.shape)
                acc = acc + jnp.einsum(
                    "bhwc,cd->bhwd", sl, k[dy, dx],
                    preferred_element_type=jnp.float32)
        return acc.astype(x.dtype)

    timed("9-shift einsum", mk_nhwc, shifts)

    # the packed-kernel variant the model actually runs (4C in/out)
    k4 = jnp.asarray(rng.randn(3, 3, 4 * C, 4 * C) * 0.02, jnp.bfloat16)
    FL4 = B * (H // 2) * (W // 2) * (4 * C) ** 2 * 9 * 2

    def packed(x):
        return jax.lax.conv_general_dilated(
            x, k4, (1, 1), ((1, 1), (1, 1)),
            dimension_numbers=("NHWC", "HWIO", "NHWC"))

    x4 = lambda: jnp.asarray(rng.randn(B, H // 2, W // 2, 4 * C) * 0.05, jnp.bfloat16)
    x40 = x4()

    def multi4(x0):
        def body(x, _):
            y = packed(x)
            return (y * (0.05 / jnp.maximum(jnp.mean(jnp.abs(y)), 1e-3))).astype(x0.dtype), ()
        xN, _ = jax.lax.scan(body, x0, None, length=SCAN)
        return jnp.sum(xN.astype(jnp.float32))

    f4 = jax.jit(multi4)
    _ = float(f4(x40))
    ts = []
    for _ in range(4):
        t0 = time.perf_counter()
        _ = float(f4(x40))
        ts.append(time.perf_counter() - t0)
    ms = float(np.median(ts)) * 1e3 / SCAN
    print(f"{'packed 360²x512 (4x flops)':36s} {ms:7.2f} ms  {FL4 / ms / 1e9:7.1f} TF/s")


if __name__ == "__main__":
    main()
