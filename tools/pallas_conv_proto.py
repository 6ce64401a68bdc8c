"""Prototype: 3x3 stride-1 conv as a Pallas shift-matmul kernel.

Motivation (tools/conv_ab.py): XLA's TPU conv at the teacher stage-1 shape
(2,720,720,128)x(3,3,128,128) runs at ~32 TF/s in every formulation while
plain matmul fusions reach ~158 TF/s. The conv is 9 shifted (BH*W, C) @
(C, Co) MXU matmuls per 8-row block — this prototype measures that.

The input arrives H-padded by one zero row each side (in the integrated
fused-block kernel the producer writes the padded layout directly, so the
pad costs nothing in a conv chain); W shifts are VMEM concats.

Usage: JAX_COMPILATION_CACHE_DIR=.jax_tpu_cache python tools/pallas_conv_proto.py
       (interpret-mode exactness asserted first on a small shape, CPU ok)
"""

import functools
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import numpy as np

BH = 8  # output rows per program


def _kernel(x_hbm, k_ref, out_ref, xbuf, sem, *, w, c, co):
    import jax
    import jax.numpy as jnp
    import jax.experimental.pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    b = pl.program_id(0)
    i = pl.program_id(1)
    cp = pltpu.make_async_copy(x_hbm.at[b, pl.ds(i * BH, BH + 2)], xbuf, sem)
    cp.start()
    cp.wait()
    x = xbuf[:]  # (BH+2, w, c) — padded rows are zeros at the edges
    zcol = jnp.zeros((BH + 2, 1, c), x.dtype)
    shifted = (
        jnp.concatenate([zcol, x[:, :-1]], axis=1),  # kx=0 reads the left col
        x,
        jnp.concatenate([x[:, 1:], zcol], axis=1),
    )
    acc = jnp.zeros((BH * w, co), jnp.float32)
    for ky in range(3):
        for kx in range(3):
            sl = shifted[kx][ky:ky + BH].reshape(BH * w, c)
            acc += jnp.dot(sl, k_ref[ky, kx], preferred_element_type=jnp.float32)
    out_ref[:] = acc.reshape(1, BH, w, co).astype(out_ref.dtype)


@functools.partial(__import__("jax").jit, static_argnames=("interpret",))
def conv3x3_pallas(xp, k, interpret=False):
    """xp: (B, H+2, W, C) with zero rows at [0] and [H+1]."""
    import jax
    import jax.experimental.pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    bsz, hp, w, c = xp.shape
    h = hp - 2
    co = k.shape[-1]
    assert h % BH == 0
    return pl.pallas_call(
        functools.partial(_kernel, w=w, c=c, co=co),
        grid=(bsz, h // BH),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.ANY),
            pl.BlockSpec((3, 3, c, co), lambda b, i: (0, 0, 0, 0)),
        ],
        out_specs=pl.BlockSpec((1, BH, w, co), lambda b, i: (b, i, 0, 0)),
        out_shape=jax.ShapeDtypeStruct((bsz, h, w, co), xp.dtype),
        scratch_shapes=[
            pltpu.VMEM((BH + 2, w, c), xp.dtype),
            pltpu.SemaphoreType.DMA,
        ],
        interpret=interpret,
    )(xp, k)


def main():
    import jax
    import jax.numpy as jnp

    jax.config.update(
        "jax_compilation_cache_dir",
        str(Path(__file__).resolve().parent.parent / ".jax_tpu_cache"),
    )

    rng = np.random.RandomState(0)

    def pad_h(x):
        return jnp.pad(x, ((0, 0), (1, 1), (0, 0), (0, 0)))

    # exactness first (small shape, interpret mode works on any backend)
    xs = jnp.asarray(rng.randn(2, 16, 24, 8), jnp.float32)
    ks = jnp.asarray(rng.randn(3, 3, 8, 16) * 0.1, jnp.float32)
    want = jax.lax.conv_general_dilated(
        xs, ks, (1, 1), ((1, 1), (1, 1)),
        dimension_numbers=("NHWC", "HWIO", "NHWC"))
    got = conv3x3_pallas(pad_h(xs), ks, interpret=True)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), rtol=1e-5, atol=1e-5)
    print("interpret exactness: OK")

    if jax.devices()[0].platform != "tpu":
        print("no TPU; skipping timing")
        return

    B, H, W, C = 2, 720, 720, 128
    FLOPS = B * H * W * C * C * 9 * 2
    x = jnp.asarray(rng.randn(B, H, W, C) * 0.05, jnp.bfloat16)
    k = jnp.asarray(rng.randn(3, 3, C, C) * 0.05, jnp.bfloat16)

    y_p = conv3x3_pallas(pad_h(x), k)
    y_x = jax.lax.conv_general_dilated(
        x, k, (1, 1), ((1, 1), (1, 1)),
        dimension_numbers=("NHWC", "HWIO", "NHWC"))
    err = float(jnp.max(jnp.abs(y_p.astype(jnp.float32) - y_x.astype(jnp.float32))))
    print(f"max |pallas - xla| on TPU: {err}")

    SCAN = 8

    def multi(x0):
        def body(xc, _):
            y = conv3x3_pallas(pad_h(xc), k)  # pad included: conservative
            return (y * (0.05 / jnp.maximum(jnp.mean(jnp.abs(y)), 1e-3))).astype(x0.dtype), ()
        xN, _ = jax.lax.scan(body, x0, None, length=SCAN)
        return jnp.sum(xN.astype(jnp.float32))

    f = jax.jit(multi)
    _ = float(f(x))
    ts = []
    for _ in range(4):
        t0 = time.perf_counter()
        _ = float(f(x))
        ts.append(time.perf_counter() - t0)
    ms = float(np.median(ts)) * 1e3 / SCAN
    print(f"pallas conv3x3 (incl. H-pad): {ms:.2f} ms  {FLOPS / ms / 1e9:.1f} TF/s")


if __name__ == "__main__" and len(sys.argv) == 1:
    main()


def _kernel_dots(x_hbm, k_ref, out_ref, xbuf, sem, *, w, c, co):
    """Diagnostic: same DMA + 9 dots, NO shifts/slices — pure matmul rate."""
    import jax.numpy as jnp
    import jax.experimental.pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    b = pl.program_id(0)
    i = pl.program_id(1)
    cp = pltpu.make_async_copy(x_hbm.at[b, pl.ds(i * BH, BH + 2)], xbuf, sem)
    cp.start()
    cp.wait()
    flat = xbuf[:].reshape((BH + 2) * w, c)[: BH * w]
    acc = jnp.zeros((BH * w, co), jnp.float32)
    for ky in range(3):
        for kx in range(3):
            acc += jnp.dot(flat, k_ref[ky, kx], preferred_element_type=jnp.float32)
    out_ref[:] = acc.reshape(1, BH, w, co).astype(out_ref.dtype)


def main_dots():
    import jax
    import jax.numpy as jnp
    import jax.experimental.pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    jax.config.update(
        "jax_compilation_cache_dir",
        str(Path(__file__).resolve().parent.parent / ".jax_tpu_cache"),
    )
    rng = np.random.RandomState(0)
    B, H, W, C = 2, 720, 720, 128
    FLOPS = B * H * W * C * C * 9 * 2
    xp = jnp.asarray(rng.randn(B, H + 2, W, C) * 0.05, jnp.bfloat16)
    k = jnp.asarray(rng.randn(3, 3, C, C) * 0.05, jnp.bfloat16)

    @jax.jit
    def run(xp, k):
        return pl.pallas_call(
            functools.partial(_kernel_dots, w=W, c=C, co=C),
            grid=(B, H // BH),
            in_specs=[
                pl.BlockSpec(memory_space=pltpu.ANY),
                pl.BlockSpec((3, 3, C, C), lambda b, i: (0, 0, 0, 0)),
            ],
            out_specs=pl.BlockSpec((1, BH, W, C), lambda b, i: (b, i, 0, 0)),
            out_shape=jax.ShapeDtypeStruct((B, H, W, C), xp.dtype),
            scratch_shapes=[
                pltpu.VMEM((BH + 2, W, C), xp.dtype),
                pltpu.SemaphoreType.DMA,
            ],
        )(xp, k)

    SCAN = 8

    def multi(x0):
        def body(xc, _):
            y = run(jnp.pad(xc, ((0, 0), (1, 1), (0, 0), (0, 0))), k)
            return (y * (0.05 / jnp.maximum(jnp.mean(jnp.abs(y)), 1e-3))).astype(x0.dtype), ()
        xN, _ = jax.lax.scan(body, x0, None, length=SCAN)
        return jnp.sum(xN.astype(jnp.float32))

    x = jnp.asarray(rng.randn(B, H, W, C) * 0.05, jnp.bfloat16)
    f = jax.jit(multi)
    _ = float(f(x))
    ts = []
    for _ in range(4):
        t0 = time.perf_counter()
        _ = float(f(x))
        ts.append(time.perf_counter() - t0)
    ms = float(np.median(ts)) * 1e3 / SCAN
    print(f"pallas 9-dots no-shift: {ms:.2f} ms  {FLOPS / ms / 1e9:.1f} TF/s")


if __name__ == "__main__" and len(sys.argv) > 1 and sys.argv[1] == "dots":
    main_dots()
    sys.exit(0)


def _kernel_k1152(x_hbm, k_ref, out_ref, xbuf, sem, *, w, c, co):
    """One im2col dot per block: (BH*w, 9c) @ (9c, co) — K=1152."""
    import jax.numpy as jnp
    import jax.experimental.pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    b = pl.program_id(0)
    i = pl.program_id(1)
    cp = pltpu.make_async_copy(x_hbm.at[b, pl.ds(i * BH, BH + 2)], xbuf, sem)
    cp.start()
    cp.wait()
    x = xbuf[:]
    zcol = jnp.zeros((BH + 2, 1, c), x.dtype)
    shifted = (
        jnp.concatenate([zcol, x[:, :-1]], axis=1),
        x,
        jnp.concatenate([x[:, 1:], zcol], axis=1),
    )
    cols = [
        shifted[kx][ky:ky + BH].reshape(BH * w, c)
        for ky in range(3) for kx in range(3)
    ]
    im2col = jnp.concatenate(cols, axis=1)  # (BH*w, 9c)
    out = jnp.dot(im2col, k_ref[:], preferred_element_type=jnp.float32)
    out_ref[:] = out.reshape(1, BH, w, co).astype(out_ref.dtype)


def _kernel_n512(x_hbm, k_ref, out_ref, xbuf, sem, *, w, c, co):
    """9 dots with co=512 (rate probe for wider N)."""
    import jax.numpy as jnp
    import jax.experimental.pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    b = pl.program_id(0)
    i = pl.program_id(1)
    cp = pltpu.make_async_copy(x_hbm.at[b, pl.ds(i * BH, BH + 2)], xbuf, sem)
    cp.start()
    cp.wait()
    flat = xbuf[:].reshape((BH + 2) * w, c)[: BH * w]
    acc = jnp.zeros((BH * w, co), jnp.float32)
    for t in range(9):
        acc += jnp.dot(flat, k_ref[t], preferred_element_type=jnp.float32)
    out_ref[:] = acc.reshape(1, BH, w, co).astype(out_ref.dtype)


def main_variants():
    import jax
    import jax.numpy as jnp
    import jax.experimental.pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    jax.config.update(
        "jax_compilation_cache_dir",
        str(Path(__file__).resolve().parent.parent / ".jax_tpu_cache"),
    )
    rng = np.random.RandomState(0)
    B, H, W, C = 2, 720, 720, 128

    def timeit_case(name, kern, kshape, co, flops):
        k = jnp.asarray(rng.randn(*kshape) * 0.05, jnp.bfloat16)
        x = jnp.asarray(rng.randn(B, H, W, C) * 0.05, jnp.bfloat16)

        @jax.jit
        def run(xp, k):
            return pl.pallas_call(
                functools.partial(kern, w=W, c=C, co=co),
                grid=(B, H // BH),
                in_specs=[
                    pl.BlockSpec(memory_space=pltpu.ANY),
                    pl.BlockSpec(kshape, lambda b, i: (0,) * len(kshape)),
                ],
                out_specs=pl.BlockSpec((1, BH, W, co), lambda b, i: (b, i, 0, 0)),
                out_shape=jax.ShapeDtypeStruct((B, H, W, co), xp.dtype),
                scratch_shapes=[
                    pltpu.VMEM((BH + 2, W, C), xp.dtype),
                    pltpu.SemaphoreType.DMA,
                ],
                compiler_params=pltpu.CompilerParams(
                    vmem_limit_bytes=64 * 1024 * 1024),
            )(xp, k)

        SCAN = 8

        def multi(x0):
            def body(xc, _):
                y = run(jnp.pad(xc, ((0, 0), (1, 1), (0, 0), (0, 0))), k)
                s = 0.05 / jnp.maximum(jnp.mean(jnp.abs(y)), 1e-3)
                return (y[..., :C] * s).astype(x0.dtype), ()
            xN, _ = jax.lax.scan(body, x0, None, length=SCAN)
            return jnp.sum(xN.astype(jnp.float32))

        f = jax.jit(multi)
        _ = float(f(x))
        ts = []
        for _ in range(4):
            t0 = time.perf_counter()
            _ = float(f(x))
            ts.append(time.perf_counter() - t0)
        ms = float(np.median(ts)) * 1e3 / SCAN
        print(f"{name:28s} {ms:7.2f} ms  {flops / ms / 1e9:7.1f} TF/s")

    base = B * H * W * C * C * 9 * 2
    timeit_case("k1152 one-dot im2col", _kernel_k1152, (9 * C, C), C, base)
    timeit_case("n512 9-dots", _kernel_n512, (9, C, 4 * C), 4 * C, base * 4)


if __name__ == "__main__" and len(sys.argv) > 1 and sys.argv[1] == "variants":
    main_variants()
    sys.exit(0)


def _kernel_shiftout(x_hbm, k_ref, out_ref, xbuf, sem, *, w, c, co, prod_bf16):
    """All 9 tap products as ONE wide-N matmul (N = 9*co engages all 4 MXUs;
    N=co engages one — tools/pallas_conv_proto.py 'n512' probe), then 9
    shifted adds of the product views (shifts measured free)."""
    import jax.numpy as jnp
    import jax.experimental.pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    b = pl.program_id(0)
    i = pl.program_id(1)
    rows = BH + 2
    cp = pltpu.make_async_copy(x_hbm.at[b, pl.ds(i * BH, rows)], xbuf, sem)
    cp.start()
    cp.wait()
    flat = xbuf[:].reshape(rows * w, c)
    prod = jnp.dot(flat, k_ref[:], preferred_element_type=jnp.float32)
    if prod_bf16:
        prod = prod.astype(jnp.bfloat16)
    prod = prod.reshape(rows, w, 9, co)
    acc = jnp.zeros((BH, w, co), jnp.float32)
    zcol = jnp.zeros((BH, 1, co), prod.dtype)
    for ky in range(3):
        for kx in range(3):
            p = prod[ky:ky + BH, :, ky * 3 + kx]  # (BH, w, co)
            if kx == 0:
                p = jnp.concatenate([zcol, p[:, :-1]], axis=1)
            elif kx == 2:
                p = jnp.concatenate([p[:, 1:], zcol], axis=1)
            acc += p.astype(jnp.float32)
    out_ref[:] = acc.reshape(1, BH, w, co).astype(out_ref.dtype)


def conv3x3_shiftout(xp, k9, prod_bf16, interpret=False):
    import jax
    import jax.experimental.pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    bsz, hp, w, c = xp.shape
    h = hp - 2
    co = k9.shape[-1] // 9
    return pl.pallas_call(
        functools.partial(_kernel_shiftout, w=w, c=c, co=co, prod_bf16=prod_bf16),
        grid=(bsz, h // BH),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.ANY),
            pl.BlockSpec((c, 9 * co), lambda b, i: (0, 0)),
        ],
        out_specs=pl.BlockSpec((1, BH, w, co), lambda b, i: (b, i, 0, 0)),
        out_shape=jax.ShapeDtypeStruct((bsz, h, w, co), xp.dtype),
        scratch_shapes=[
            pltpu.VMEM((BH + 2, w, c), xp.dtype),
            pltpu.SemaphoreType.DMA,
        ],
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=64 * 1024 * 1024),
        interpret=interpret,
    )(xp, k9)


def main_shiftout():
    import jax
    import jax.numpy as jnp

    jax.config.update(
        "jax_compilation_cache_dir",
        str(Path(__file__).resolve().parent.parent / ".jax_tpu_cache"),
    )
    rng = np.random.RandomState(0)

    def pad_h(x):
        return jnp.pad(x, ((0, 0), (1, 1), (0, 0), (0, 0)))

    def pack_k(k):  # (3,3,C,Co) -> (C, 9*Co), tap-major columns
        return jnp.transpose(k, (2, 0, 1, 3)).reshape(k.shape[2], -1)

    # exactness (f32 product path must match lax.conv to tolerance)
    xs = jnp.asarray(rng.randn(2, 16, 24, 8), jnp.float32)
    ks = jnp.asarray(rng.randn(3, 3, 8, 16) * 0.1, jnp.float32)
    want = jax.lax.conv_general_dilated(
        xs, ks, (1, 1), ((1, 1), (1, 1)),
        dimension_numbers=("NHWC", "HWIO", "NHWC"))
    got = conv3x3_shiftout(pad_h(xs), pack_k(ks), False, interpret=True)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), rtol=1e-5, atol=1e-5)
    print("shiftout interpret exactness: OK")

    if jax.devices()[0].platform != "tpu":
        return

    B, H, W, C = 2, 720, 720, 128
    FLOPS = B * H * W * C * C * 9 * 2
    x = jnp.asarray(rng.randn(B, H, W, C) * 0.05, jnp.bfloat16)
    k = jnp.asarray(rng.randn(3, 3, C, C) * 0.05, jnp.bfloat16)
    k9 = pack_k(k)

    y_x = jax.lax.conv_general_dilated(
        x, k, (1, 1), ((1, 1), (1, 1)),
        dimension_numbers=("NHWC", "HWIO", "NHWC")).astype(jnp.float32)
    scale = float(jnp.mean(jnp.abs(y_x)))
    for name, pb in (("f32-prod", False), ("bf16-prod", True)):
        y_p = jax.jit(conv3x3_shiftout, static_argnums=(2,))(
            pad_h(x), k9, pb).astype(jnp.float32)
        err = float(jnp.max(jnp.abs(y_p - y_x))) / scale
        SCAN = 8

        def multi(x0):
            def body(xc, _):
                y = jax.jit(conv3x3_shiftout, static_argnums=(2,))(pad_h(xc), k9, pb)
                s = 0.05 / jnp.maximum(jnp.mean(jnp.abs(y)), 1e-3)
                return (y * s).astype(x0.dtype), ()
            xN, _ = jax.lax.scan(body, x0, None, length=SCAN)
            return jnp.sum(xN.astype(jnp.float32))

        f = jax.jit(multi)
        _ = float(f(x))
        ts = []
        for _ in range(4):
            t0 = time.perf_counter()
            _ = float(f(x))
            ts.append(time.perf_counter() - t0)
        ms = float(np.median(ts)) * 1e3 / SCAN
        print(f"shiftout {name:10s} {ms:6.2f} ms  {FLOPS / ms / 1e9:6.1f} TF/s  rel-err {err:.2e}")


if __name__ == "__main__" and len(sys.argv) > 1 and sys.argv[1] == "shiftout":
    main_shiftout()
    sys.exit(0)


def _kernel_tree(x_hbm, k_ref, out_ref, xbuf, sem, *, w, c, co):
    """9 INDEPENDENT dots (no serial acc chain), pairwise tree sum."""
    import jax.numpy as jnp
    import jax.experimental.pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    b = pl.program_id(0)
    i = pl.program_id(1)
    cp = pltpu.make_async_copy(x_hbm.at[b, pl.ds(i * BH, BH + 2)], xbuf, sem)
    cp.start()
    cp.wait()
    flat = xbuf[:].reshape((BH + 2) * w, c)[: BH * w]
    prods = [
        jnp.dot(flat, k_ref[t], preferred_element_type=jnp.float32)
        for t in range(9)
    ]
    while len(prods) > 1:
        nxt = [a + b2 for a, b2 in zip(prods[0::2], prods[1::2])]
        if len(prods) % 2:
            nxt.append(prods[-1])
        prods = nxt
    out_ref[:] = prods[0].reshape(1, BH, w, co).astype(out_ref.dtype)


def _kernel_tdot(x_hbm, k_ref, out_ref, xbuf, sem, *, w, c, co):
    """Transposed: (co, c) @ (c, M) — N huge, M small."""
    import jax.numpy as jnp
    import jax.experimental.pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    b = pl.program_id(0)
    i = pl.program_id(1)
    cp = pltpu.make_async_copy(x_hbm.at[b, pl.ds(i * BH, BH + 2)], xbuf, sem)
    cp.start()
    cp.wait()
    flat = xbuf[:].reshape((BH + 2) * w, c)[: BH * w]
    xt = flat.T  # (c, M)
    acc = jnp.zeros((co, BH * w), jnp.float32)
    for t in range(9):
        acc += jnp.dot(k_ref[t].T, xt, preferred_element_type=jnp.float32)
    out_ref[:] = acc.T.reshape(1, BH, w, co).astype(out_ref.dtype)


def main_probe2():
    import jax
    import jax.numpy as jnp
    import jax.experimental.pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    jax.config.update(
        "jax_compilation_cache_dir",
        str(Path(__file__).resolve().parent.parent / ".jax_tpu_cache"),
    )
    rng = np.random.RandomState(0)
    B, H, W, C = 2, 720, 720, 128
    FLOPS = B * H * W * C * C * 9 * 2

    for name, kern in (("tree 9-indep dots", _kernel_tree),
                       ("transposed dots", _kernel_tdot)):
        k = jnp.asarray(rng.randn(9, C, C) * 0.05, jnp.bfloat16)
        x = jnp.asarray(rng.randn(B, H, W, C) * 0.05, jnp.bfloat16)

        @jax.jit
        def run(xp, k, kern=kern):
            return pl.pallas_call(
                functools.partial(kern, w=W, c=C, co=C),
                grid=(B, H // BH),
                in_specs=[
                    pl.BlockSpec(memory_space=pltpu.ANY),
                    pl.BlockSpec((9, C, C), lambda b, i: (0, 0, 0)),
                ],
                out_specs=pl.BlockSpec((1, BH, W, C), lambda b, i: (b, i, 0, 0)),
                out_shape=jax.ShapeDtypeStruct((B, H, W, C), xp.dtype),
                scratch_shapes=[
                    pltpu.VMEM((BH + 2, W, C), xp.dtype),
                    pltpu.SemaphoreType.DMA,
                ],
                compiler_params=pltpu.CompilerParams(
                    vmem_limit_bytes=64 * 1024 * 1024),
            )(xp, k)

        SCAN = 8

        def multi(x0, k=k, run=run):
            def body(xc, _):
                y = run(jnp.pad(xc, ((0, 0), (1, 1), (0, 0), (0, 0))), k)
                s = 0.05 / jnp.maximum(jnp.mean(jnp.abs(y)), 1e-3)
                return (y * s).astype(x0.dtype), ()
            xN, _ = jax.lax.scan(body, x0, None, length=SCAN)
            return jnp.sum(xN.astype(jnp.float32))

        f = jax.jit(multi)
        _ = float(f(x))
        ts = []
        for _ in range(4):
            t0 = time.perf_counter()
            _ = float(f(x))
            ts.append(time.perf_counter() - t0)
        ms = float(np.median(ts)) * 1e3 / SCAN
        print(f"{name:24s} {ms:6.2f} ms  {FLOPS / ms / 1e9:6.1f} TF/s")


if __name__ == "__main__" and len(sys.argv) > 1 and sys.argv[1] == "probe2":
    main_probe2()
    sys.exit(0)


def _kernel_int8(x_hbm, k_ref, a_ref, out_ref, xbuf, sem, *, w, c, co):
    """int8 chain probe: int8 DMA in, 9 int8 dots -> int32 acc, fused
    affine+relu+quant epilogue, int8 out. Measures whether Mosaic int8
    matmul delivers the ~2x MXU rate at the conv-wall shape."""
    import jax
    import jax.numpy as jnp
    import jax.experimental.pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    b = pl.program_id(0)
    i = pl.program_id(1)
    cp = pltpu.make_async_copy(x_hbm.at[b, pl.ds(i * BH, BH + 2)], xbuf, sem)
    cp.start()
    cp.wait()
    flat = xbuf[:].reshape((BH + 2) * w, c)[: BH * w]
    acc = jnp.zeros((BH * w, co), jnp.int32)
    for t in range(9):
        acc += jax.lax.dot_general(
            flat, k_ref[t], (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.int32)
    y = acc.astype(jnp.float32) * a_ref[0][None, :]
    y = jnp.maximum(y, 0.0)
    q = jnp.clip(jnp.round(y * 0.37) - 127.0, -127.0, 127.0)
    out_ref[:] = q.reshape(1, BH, w, co).astype(jnp.int8)


def main_int8():
    import jax
    import jax.numpy as jnp
    import jax.experimental.pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    jax.config.update(
        "jax_compilation_cache_dir",
        str(Path(__file__).resolve().parent.parent / ".jax_tpu_cache"),
    )
    rng = np.random.RandomState(0)
    B, H, W, C = 2, 720, 720, 128
    FLOPS = B * H * W * C * C * 9 * 2
    k = jnp.asarray(rng.randint(-127, 128, (9, C, C)), jnp.int8)
    a = jnp.asarray(np.abs(rng.randn(1, C)) * 1e-4, jnp.float32)
    x = jnp.asarray(rng.randint(-127, 128, (B, H, W, C)), jnp.int8)

    @jax.jit
    def run(xp, k, a):
        return pl.pallas_call(
            functools.partial(_kernel_int8, w=W, c=C, co=C),
            grid=(B, H // BH),
            in_specs=[
                pl.BlockSpec(memory_space=pltpu.ANY),
                pl.BlockSpec((9, C, C), lambda b, i: (0, 0, 0)),
                pl.BlockSpec((1, C), lambda b, i: (0, 0)),
            ],
            out_specs=pl.BlockSpec((1, BH, W, C), lambda b, i: (b, i, 0, 0)),
            out_shape=jax.ShapeDtypeStruct((B, H, W, C), jnp.int8),
            scratch_shapes=[
                pltpu.VMEM((BH + 2, W, C), jnp.int8),
                pltpu.SemaphoreType.DMA,
            ],
            compiler_params=pltpu.CompilerParams(
                vmem_limit_bytes=64 * 1024 * 1024),
        )(xp, k, a)

    SCAN = 8

    def multi(x0):
        def body(xc, _):
            y = run(jnp.pad(xc, ((0, 0), (1, 1), (0, 0), (0, 0))), k, a)
            return y, ()
        xN, _ = jax.lax.scan(body, x0, None, length=SCAN)
        return jnp.sum(xN.astype(jnp.float32))

    f = jax.jit(multi)
    _ = float(f(x))
    ts = []
    for _ in range(4):
        t0 = time.perf_counter()
        _ = float(f(x))
        ts.append(time.perf_counter() - t0)
    ms = float(np.median(ts)) * 1e3 / SCAN
    print(f"pallas int8 9-dots fused: {ms:.2f} ms  {FLOPS / ms / 1e9:.1f} TF/s")


if __name__ == "__main__" and len(sys.argv) > 1 and sys.argv[1] == "int8":
    main_int8()
    sys.exit(0)


def _kernel_int8_n512(x_hbm, k_ref, a_ref, out_ref, xbuf, sem, *, w, c, co):
    """int8 rate probe at N=512 (4x lanes): 9 dots co=512."""
    import jax
    import jax.numpy as jnp
    import jax.experimental.pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    b = pl.program_id(0)
    i = pl.program_id(1)
    cp = pltpu.make_async_copy(x_hbm.at[b, pl.ds(i * BH, BH + 2)], xbuf, sem)
    cp.start()
    cp.wait()
    flat = xbuf[:].reshape((BH + 2) * w, c)[: BH * w]
    acc = jnp.zeros((BH * w, co), jnp.int32)
    for t in range(9):
        acc += jax.lax.dot_general(
            flat, k_ref[t], (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.int32)
    y = acc.astype(jnp.float32) * a_ref[0][None, :]
    q = jnp.clip(jnp.round(y * 0.37) - 127.0, -127.0, 127.0)
    out_ref[:] = q.reshape(1, BH, w, co).astype(jnp.int8)


def main_int8_n512():
    import jax
    import jax.numpy as jnp
    import jax.experimental.pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    jax.config.update(
        "jax_compilation_cache_dir",
        str(Path(__file__).resolve().parent.parent / ".jax_tpu_cache"),
    )
    rng = np.random.RandomState(0)
    B, H, W, C = 2, 720, 720, 128
    CO = 512
    FLOPS = B * H * W * C * CO * 9 * 2
    k = jnp.asarray(rng.randint(-127, 128, (9, C, CO)), jnp.int8)
    a = jnp.asarray(np.abs(rng.randn(1, CO)) * 1e-4, jnp.float32)
    x = jnp.asarray(rng.randint(-127, 128, (B, H, W, C)), jnp.int8)

    @jax.jit
    def run(xp, k, a):
        return pl.pallas_call(
            functools.partial(_kernel_int8_n512, w=W, c=C, co=CO),
            grid=(B, H // BH),
            in_specs=[
                pl.BlockSpec(memory_space=pltpu.ANY),
                pl.BlockSpec((9, C, CO), lambda b, i: (0, 0, 0)),
                pl.BlockSpec((1, CO), lambda b, i: (0, 0)),
            ],
            out_specs=pl.BlockSpec((1, BH, W, CO), lambda b, i: (b, i, 0, 0)),
            out_shape=jax.ShapeDtypeStruct((B, H, W, CO), jnp.int8),
            scratch_shapes=[
                pltpu.VMEM((BH + 2, W, C), jnp.int8),
                pltpu.SemaphoreType.DMA,
            ],
            compiler_params=pltpu.CompilerParams(
                vmem_limit_bytes=100 * 1024 * 1024),
        )(xp, k, a)

    SCAN = 8

    def multi(x0):
        def body(xc, _):
            y = run(jnp.pad(xc, ((0, 0), (1, 1), (0, 0), (0, 0))), k, a)
            return y[..., :C], ()
        xN, _ = jax.lax.scan(body, x0, None, length=SCAN)
        return jnp.sum(xN.astype(jnp.float32))

    f = jax.jit(multi)
    _ = float(f(x))
    ts = []
    for _ in range(4):
        t0 = time.perf_counter()
        _ = float(f(x))
        ts.append(time.perf_counter() - t0)
    ms = float(np.median(ts)) * 1e3 / SCAN
    print(f"pallas int8 9-dots N=512: {ms:.2f} ms  {FLOPS / ms / 1e9:.1f} TF/s")


if __name__ == "__main__" and len(sys.argv) > 1 and sys.argv[1] == "int8n512":
    main_int8_n512()
    sys.exit(0)
