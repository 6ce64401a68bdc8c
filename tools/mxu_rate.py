"""Pure MXU rate vs matmul shape on the TPU (Pallas, operands resident).

Calibrates the small-N wall found by pallas_conv_proto: a dot engages
~one MXU per 128 output lanes. Measures (M,K)x(K,N) with VMEM-resident
operands, Y independent dots per program (no accumulation chain), scan-
amortized and host-read synced.

Usage: JAX_COMPILATION_CACHE_DIR=.jax_tpu_cache python tools/mxu_rate.py
"""

import functools
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import numpy as np

REPS = 8     # dots per program
GRID = 64    # programs per call
SCAN = 8


def main():
    import jax
    import jax.numpy as jnp
    import jax.experimental.pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    jax.config.update(
        "jax_compilation_cache_dir",
        str(Path(__file__).resolve().parent.parent / ".jax_tpu_cache"),
    )
    rng = np.random.RandomState(0)

    def case(m, k, n, dtype=jnp.bfloat16):
        a = jnp.asarray(rng.randn(m, k) * 0.05, dtype)
        b = jnp.asarray(rng.randn(k, n) * 0.05, dtype)

        def kern(a_ref, b_ref, o_ref):
            acc = jnp.zeros((m, n), jnp.float32)
            av = a_ref[:]
            bv = b_ref[:]
            for r in range(REPS):
                # slight input rotation so the dots are not CSE'd
                acc += jnp.dot(av + jnp.float32(r).astype(av.dtype), bv,
                               preferred_element_type=jnp.float32)
            o_ref[:] = acc.astype(o_ref.dtype)

        @jax.jit
        def run(a, b):
            return pl.pallas_call(
                kern,
                grid=(GRID,),
                in_specs=[
                    pl.BlockSpec((m, k), lambda i: (0, 0)),
                    pl.BlockSpec((k, n), lambda i: (0, 0)),
                ],
                out_specs=pl.BlockSpec((m, n), lambda i: (0, 0)),
                out_shape=jax.ShapeDtypeStruct((m, n), a.dtype),
                compiler_params=pltpu.CompilerParams(
                    vmem_limit_bytes=100 * 1024 * 1024),
            )(a, b)

        def multi(a, b):
            def body(c, _):
                y = run(a + c, b)
                return jnp.mean(y).astype(a.dtype) * 1e-6, ()
            s, _ = jax.lax.scan(body, jnp.zeros((), a.dtype), None, length=SCAN)
            return s

        f = jax.jit(multi)
        _ = float(f(a, b))
        ts = []
        for _ in range(4):
            t0 = time.perf_counter()
            _ = float(f(a, b))
            ts.append(time.perf_counter() - t0)
        sec = float(np.median(ts)) / SCAN
        fl = 2.0 * m * k * n * REPS * GRID
        print(f"M={m:5d} K={k:4d} N={n:4d} {dtype.__name__}: {fl / sec / 1e12:7.1f} TF/s")

    for n in (128, 256, 512, 1024):
        case(2048, 512, n)
    case(2048, 128, 128)
    case(8192, 128, 128)
    case(2048, 512, 512, jnp.float32)


if __name__ == "__main__":
    main()
