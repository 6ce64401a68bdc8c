"""DCN microbench on TPU: Pallas MXU kernels vs XLA sorted-domain path.

Usage: JAX_COMPILATION_CACHE_DIR=.jax_tpu_cache python tools/dcn_bench.py [fwd|grad]

Times both CMA sites (180²→90² and 90²→45², C=256, bs2, bf16) with the
BENCH_SCAN in-device loop methodology (CLAUDE.md: per-call tunnel floor
~30-60 ms; thread state through the scan; consume all grad leaves).
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

    from radardistill_tpu.ops.dcn import _modulated_deform_conv_xla
    from radardistill_tpu.ops.pallas_dcn import modulated_deform_conv_mxu

    mode = sys.argv[1] if len(sys.argv) > 1 else "grad"
    scan_k = 8

    for H in (180, 90):
        B, C, Co = 2, 256, 256
        Ho = H // 2
        rng = np.random.RandomState(0)
        x = jnp.asarray(rng.randn(B, H, H, C), jnp.bfloat16)
        off = jnp.asarray(
            np.clip(2.0 * rng.randn(B, Ho, Ho, 18), -7.5, 7.5), jnp.bfloat16)
        msk = jnp.asarray(rng.rand(B, Ho, Ho, 9), jnp.bfloat16)
        w = jnp.asarray(rng.randn(3, 3, C, Co) / 48.0, jnp.bfloat16)

        def run(fn, name):
            if mode == "fwd":
                def body(carry, _):
                    y = fn(x + carry, off, msk, w)
                    s = jnp.sum(y, dtype=jnp.float32)
                    return (s * 1e-30).astype(x.dtype), s
            else:
                def loss(x_, off_, msk_, w_):
                    return jnp.sum(
                        fn(x_, off_, msk_, w_).astype(jnp.float32) ** 2)

                def body(carry, _):
                    gs = jax.grad(loss, argnums=(0, 1, 2, 3))(
                        x + carry, off, msk, w)
                    s = sum(jnp.sum(g, dtype=jnp.float32) for g in gs)
                    return (s * 1e-30).astype(x.dtype), s

            @jax.jit
            def multi():
                _, ss = jax.lax.scan(
                    body, jnp.zeros((), x.dtype), None, length=scan_k)
                return ss

            out = multi()
            _ = float(out.sum())  # compile + sync (host readback)
            ts = []
            for _i in range(6):
                t0 = time.perf_counter()
                _ = float(multi().sum())
                ts.append(time.perf_counter() - t0)
            ms = float(np.median(ts)) * 1e3 / scan_k
            print(f"H={H} {name:>6} {mode}: {ms:8.2f} ms/iter", flush=True)

        run(lambda *a: modulated_deform_conv_mxu(*a, 2, 1), "pallas")
        run(lambda *a: _modulated_deform_conv_xla(*a, stride=2, padding=1), "xla")


if __name__ == "__main__":
    main()
