"""ops/pallas_wide_conv.py: the trainable ky-stacked 3x3 conv.

Exactness contract: conv3x3_wide == lax.conv_general_dilated (stride 1,
pad 1, NHWC/HWIO) at the operands' dtype resolution — forward AND both
custom-VJP gradients (dX is the same kernel on flipped-transposed weights;
dW is the batch<->feature-swapped XLA conv). Interpret mode on CPU; the
same code path runs compiled on TPU (A/B'd on hardware per CLAUDE.md).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from radardistill_tpu.ops.pallas_wide_conv import conv3x3_wide


def _ref_conv(x, k):
    return jax.lax.conv_general_dilated(
        x, k, window_strides=(1, 1), padding=((1, 1), (1, 1)),
        dimension_numbers=("NHWC", "HWIO", "NHWC"))


def _rand(key, shape, dtype):
    return jax.random.normal(key, shape, jnp.float32).astype(dtype)


@pytest.mark.parametrize("h,w,ci,co", [
    (8, 8, 128, 128),      # minimal aligned
    (12, 20, 128, 256),    # h%8!=0 -> bh=4; w pads 20->32
    (6, 8, 256, 128),      # bh=2
])
def test_forward_f32_exact(h, w, ci, co):
    kx, kk = jax.random.split(jax.random.PRNGKey(h * w + ci))
    x = _rand(kx, (2, h, w, ci), jnp.float32)
    k = _rand(kk, (3, 3, ci, co), jnp.float32) * 0.1
    y = conv3x3_wide(x, k)
    ref = _ref_conv(x, k)
    # identical contraction set; dot reassociation only -> tight f32 rtol
    np.testing.assert_allclose(np.asarray(y), np.asarray(ref),
                               rtol=2e-5, atol=2e-5)


def test_forward_bf16():
    kx, kk = jax.random.split(jax.random.PRNGKey(7))
    x = _rand(kx, (1, 16, 16, 128), jnp.bfloat16)
    k = _rand(kk, (3, 3, 128, 128), jnp.bfloat16) * 0.1
    y = conv3x3_wide(x, k)
    assert y.dtype == jnp.bfloat16
    ref = _ref_conv(x.astype(jnp.float32), k.astype(jnp.float32))
    # bf16 operands, f32 accumulation both sides; only the output rounding
    # and tap-sum association differ
    np.testing.assert_allclose(np.asarray(y, np.float32), np.asarray(ref),
                               rtol=2e-2, atol=2e-2)


def test_grads_match_xla():
    kx, kk, kg = jax.random.split(jax.random.PRNGKey(3), 3)
    x = _rand(kx, (2, 8, 8, 128), jnp.float32)
    k = _rand(kk, (3, 3, 128, 128), jnp.float32) * 0.1
    ct = _rand(kg, (2, 8, 8, 128), jnp.float32)

    def loss(f):
        def inner(x_, k_):
            return jnp.vdot(f(x_, k_), ct)
        return inner

    gx, gk = jax.grad(loss(conv3x3_wide), argnums=(0, 1))(x, k)
    rx, rk = jax.grad(loss(_ref_conv), argnums=(0, 1))(x, k)
    np.testing.assert_allclose(np.asarray(gx), np.asarray(rx),
                               rtol=3e-5, atol=3e-5)
    np.testing.assert_allclose(np.asarray(gk), np.asarray(rk),
                               rtol=3e-5, atol=3e-5)


@pytest.mark.parametrize("h,w,ci,co", [
    (8, 8, 64, 64),       # teacher stage-2 shape class (W-paired K=128,N=384)
    (12, 20, 64, 128),    # paired W/2=10 pads to 16
])
def test_forward_paired_f32_exact(h, w, ci, co):
    kx, kk = jax.random.split(jax.random.PRNGKey(h + w + ci))
    x = _rand(kx, (2, h, w, ci), jnp.float32)
    k = _rand(kk, (3, 3, ci, co), jnp.float32) * 0.1
    y = conv3x3_wide(x, k)
    ref = _ref_conv(x, k)
    np.testing.assert_allclose(np.asarray(y), np.asarray(ref),
                               rtol=2e-5, atol=2e-5)


def test_grads_match_xla_paired():
    kx, kk, kg = jax.random.split(jax.random.PRNGKey(5), 3)
    x = _rand(kx, (2, 8, 8, 64), jnp.float32)
    k = _rand(kk, (3, 3, 64, 64), jnp.float32) * 0.1
    ct = _rand(kg, (2, 8, 8, 64), jnp.float32)

    def loss(f):
        def inner(x_, k_):
            return jnp.vdot(f(x_, k_), ct)
        return inner

    gx, gk = jax.grad(loss(conv3x3_wide), argnums=(0, 1))(x, k)
    rx, rk = jax.grad(loss(_ref_conv), argnums=(0, 1))(x, k)
    np.testing.assert_allclose(np.asarray(gx), np.asarray(rx),
                               rtol=3e-5, atol=3e-5)
    np.testing.assert_allclose(np.asarray(gk), np.asarray(rk),
                               rtol=3e-5, atol=3e-5)


def test_wpair_matches_s2d():
    """ops-local _wpair must stay the same algebra as the S2D module's
    wpair_kernel (kept separate only to avoid an ops→models import)."""
    from radardistill_tpu.models.backbone_s2d import wpair_kernel
    from radardistill_tpu.ops.pallas_wide_conv import _wpair

    k = _rand(jax.random.PRNGKey(9), (3, 3, 16, 8), jnp.float32)
    np.testing.assert_array_equal(np.asarray(_wpair(k)),
                                  np.asarray(wpair_kernel(k)))
