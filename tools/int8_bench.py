"""Microbench: can the v5e MXU int8 path beat bf16 for the frozen teacher's
convs? (VERDICT r2 next #2 feasibility probe.)

Teacher conv shapes (S2D backbone, bs2 @ 1440 grid):
  stage1 packed: (2, 720, 720, 128) x (3,3,128,128)
  stage2: (2, 360, 360, 256) x (3,3,256,256)  [packed s2]
  stage3: (2, 180, 180, 128) x (3,3,128,128)
  stage4/5: (2, 90, 90, 256) x (3,3,256,256)

Methodology: BENCH_SCAN-style in-device loop threading the carry
(CLAUDE.md DCE traps), host readback sync.
"""
import os, sys, time
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/repo/.jax_tpu_cache")
import jax, jax.numpy as jnp
import numpy as np

PLATFORM = "cpu" if "--platform" in sys.argv and "cpu" in sys.argv else None
if PLATFORM:
    jax.config.update("jax_platforms", PLATFORM)

SHAPES = [
    ("s1_packed", (2, 720, 720, 128), 128),
    ("s2_packed", (2, 360, 360, 256), 256),
    ("s3", (2, 180, 180, 128), 128),
    ("s4", (2, 90, 90, 256), 256),
]
ITERS = 16

def conv(x, k, **kw):
    return jax.lax.conv_general_dilated(
        x, k, (1, 1), ((1, 1), (1, 1)),
        dimension_numbers=("NHWC", "HWIO", "NHWC"), **kw)

def bench(fn, *args):
    f = jax.jit(fn)
    r = f(*args)
    _ = float(jnp.sum(r[1] if isinstance(r, tuple) else r))
    ts = []
    for _ in range(5):
        t0 = time.perf_counter()
        r = f(*args)
        _ = float(jnp.sum(r[1] if isinstance(r, tuple) else r))
        ts.append(time.perf_counter() - t0)
    return float(np.median(ts)) / ITERS * 1e3

for name, xs, co in SHAPES:
    ci = xs[-1]
    key = jax.random.PRNGKey(0)
    xb = jax.random.normal(key, xs, jnp.bfloat16)
    kb = jax.random.normal(key, (3, 3, ci, co), jnp.bfloat16)
    xi = jax.random.randint(key, xs, -127, 127, jnp.int8)
    ki = jax.random.randint(key, (3, 3, ci, co), -127, 127, jnp.int8)

    def loop_bf16(x, k):
        def body(c, _):
            y = conv(c, k)
            # renormalize so the carry stays bounded; keeps the loop live
            return y / (jnp.float32(1) + jnp.max(jnp.abs(y)).astype(jnp.float32)).astype(y.dtype), ()
        c, _ = jax.lax.scan(body, x, None, length=ITERS)
        return c

    def loop_int8(x, k):
        def body(c, _):
            y = conv(c, k, preferred_element_type=jnp.int32)
            # requantize: shift down and saturate back to int8 (live carry)
            return jnp.clip(y >> 12, -127, 127).astype(jnp.int8), ()
        c, _ = jax.lax.scan(body, x, None, length=ITERS)
        return c

    # int8 inputs, f32 scale fold: quantized weights + bf16 activations is
    # NOT an MXU int8 path; both operands must be int8.
    tb = bench(loop_bf16, xb, kb)
    try:
        ti = bench(loop_int8, xi, ki)
    except Exception as e:
        ti = float("nan"); print(f"{name} int8 FAILED: {type(e).__name__}: {e}")
    flops = 2 * np.prod(xs) * 9 * co
    print(f"{name:10s} bf16 {tb:7.3f} ms ({flops/tb/1e9:6.1f} TF/s)   "
          f"int8 {ti:7.3f} ms ({flops/ti/1e9:6.1f} TOP/s)")
