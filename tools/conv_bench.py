"""Micro-bench: conv shapes / scatter / BN primitives on the TPU, per-call
synced. Diagnoses where the train step's bytes/time go.

Usage: python tools/conv_bench.py
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

    def scalarize(fn):
        # axon: block_until_ready does not sync; force host readback
        def g(*args):
            out = fn(*args)
            return jax.tree.reduce(
                lambda a, l: a + jnp.sum(l.astype(jnp.float32)),
                jax.tree.leaves(out), 0.0)
        return jax.jit(g)

    def timeit(fn, *args, n=5):
        float(fn(*args))
        ts = []
        for _ in range(n):
            t0 = time.perf_counter()
            float(fn(*args))
            ts.append(time.perf_counter() - t0)
        return float(np.median(ts)) * 1e3

    rng = np.random.RandomState(0)

    def conv_case(h, w, cin, cout, dtype, note):
        x = jnp.asarray(rng.randn(1, h, w, cin), dtype)
        k = jnp.asarray(rng.randn(3, 3, cin, cout), dtype)
        f = scalarize(lambda x, k: jax.lax.conv_general_dilated(
            x, k, (1, 1), ((1, 1), (1, 1)), dimension_numbers=("NHWC", "HWIO", "NHWC")))
        ms = timeit(f, x, k)
        fl = 2 * h * w * cin * cout * 9
        print(f"conv {h}x{w}x{cin}->{cout} {note:10s}: {ms:8.2f} ms  ({fl/ms/1e9:.1f} TF/s)")

    conv_case(1440, 1440, 32, 32, jnp.bfloat16, "bf16")
    conv_case(1440, 1440, 32, 32, jnp.float32, "f32")
    conv_case(720, 720, 128, 128, jnp.bfloat16, "bf16(s2d)")
    conv_case(720, 720, 64, 64, jnp.bfloat16, "bf16")
    conv_case(360, 360, 128, 128, jnp.bfloat16, "bf16")
    conv_case(180, 180, 256, 256, jnp.bfloat16, "bf16")
    conv_case(180, 180, 512, 256, jnp.bfloat16, "bf16")

    # scatter (honest timing)
    N, C, HW = 163840, 32, 1440 * 1440
    feats = jnp.asarray(rng.randn(N, C).astype(np.float32))
    ids = jnp.asarray(rng.randint(0, HW + 1, N).astype(np.int32))
    f_max = scalarize(lambda f_, i_: jnp.where(jnp.isneginf(jax.ops.segment_max(f_, i_, num_segments=HW + 1)), 0., 1.))
    print(f"segment_max 160k->2M  : {timeit(f_max, feats, ids):8.2f} ms")
    f_sum = scalarize(lambda f_, i_: jax.ops.segment_sum(f_, i_, num_segments=HW + 1))
    print(f"segment_sum 160k->2M  : {timeit(f_sum, feats, ids):8.2f} ms")
    ids_sorted = jnp.sort(ids)
    f_max_s = scalarize(lambda f_, i_: jnp.where(jnp.isneginf(jax.ops.segment_max(
        f_, i_, num_segments=HW + 1, indices_are_sorted=True)), 0., 1.))
    print(f"segment_max sorted    : {timeit(f_max_s, feats, ids_sorted):8.2f} ms")

    # gather back
    bev = jnp.asarray(rng.randn(HW + 1, C).astype(np.float32))
    f_g = scalarize(lambda b_, i_: b_[i_])
    print(f"gather 160k from 2M   : {timeit(f_g, bev, ids):8.2f} ms")

    # masked BN pass at stride-1 size
    x = jnp.asarray(rng.randn(1, 1440, 1440, 32).astype(np.float32), jnp.bfloat16)
    m = jnp.asarray(rng.rand(1, 1440, 1440) > 0.95)

    def mbn(x, m):
        mf = m.astype(jnp.float32)[..., None]
        n = jnp.clip(mf.sum(), 1.0)
        xf = x.astype(jnp.float32)
        mean = (xf * mf).sum((0, 1, 2)) / n
        var = (((xf - mean) ** 2) * mf).sum((0, 1, 2)) / n
        return ((x - mean) * jax.lax.rsqrt(var + 1e-3)).astype(x.dtype)

    print(f"masked_bn 1440x32     : {timeit(scalarize(mbn), x, m):8.2f} ms")


if __name__ == "__main__":
    main()
