"""DCN gradcheck-style tests mirroring the reference's only unit-test harness
(pcdet/ops/basicblock/test.py:36-60 zero-offset identity checks)."""

import numpy as np
import jax
import jax.numpy as jnp

from radardistill_tpu.ops.dcn import modulated_deform_conv


def _plain_conv(x, w, stride, padding):
    return jax.lax.conv_general_dilated(
        x, w, (stride, stride), ((padding, padding), (padding, padding)),
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
    )


def test_zero_offset_unit_mask_equals_plain_conv():
    rng = np.random.RandomState(0)
    x = jnp.asarray(rng.randn(2, 12, 12, 8).astype(np.float32))
    w = jnp.asarray(rng.randn(3, 3, 8, 16).astype(np.float32))
    for stride in (1, 2):
        ho = (12 + 2 * 1 - 3) // stride + 1
        offset = jnp.zeros((2, ho, ho, 18))
        mask = jnp.ones((2, ho, ho, 9))
        got = modulated_deform_conv(x, offset, mask, w, stride=stride, padding=1)
        want = _plain_conv(x, w, stride, 1)
        np.testing.assert_allclose(np.asarray(got), np.asarray(want), rtol=1e-4, atol=1e-4)


def test_integer_offset_shifts_sampling():
    # offset of exactly +1 in x equals sampling the input shifted by 1
    rng = np.random.RandomState(1)
    x = jnp.asarray(rng.randn(1, 10, 10, 4).astype(np.float32))
    w = jnp.asarray(rng.randn(3, 3, 4, 4).astype(np.float32))
    offset = jnp.zeros((1, 10, 10, 18))
    offset = offset.at[..., 1::2].set(1.0)  # Δx = +1 for every tap
    mask = jnp.ones((1, 10, 10, 9))
    got = modulated_deform_conv(x, offset, mask, w, stride=1, padding=1)
    x_shift = jnp.pad(x, ((0, 0), (0, 0), (0, 1), (0, 0)))[:, :, 1:, :]
    want = _plain_conv(x_shift, w, 1, 1)
    # column 0 differs by design: DCN samples x[0] where the shifted-input
    # conv sees left padding — compare columns 1.. only
    np.testing.assert_allclose(
        np.asarray(got)[:, :, 1:], np.asarray(want)[:, :, 1:], rtol=1e-4, atol=1e-4
    )


def test_mask_scales_contributions():
    rng = np.random.RandomState(2)
    x = jnp.asarray(rng.randn(1, 8, 8, 4).astype(np.float32))
    w = jnp.asarray(rng.randn(3, 3, 4, 4).astype(np.float32))
    offset = jnp.zeros((1, 8, 8, 18))
    mask = jnp.full((1, 8, 8, 9), 0.5)
    got = modulated_deform_conv(x, offset, mask, w, stride=1, padding=1)
    want = 0.5 * _plain_conv(x, w, 1, 1)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), rtol=1e-4, atol=1e-5)


def test_gradients_flow():
    rng = np.random.RandomState(3)
    x = jnp.asarray(rng.randn(1, 6, 6, 2).astype(np.float32))
    w = jnp.asarray(rng.randn(3, 3, 2, 2).astype(np.float32))
    offset = jnp.asarray(rng.randn(1, 6, 6, 18).astype(np.float32) * 0.5)
    mask = jax.nn.sigmoid(jnp.asarray(rng.randn(1, 6, 6, 9).astype(np.float32)))

    def f(x, offset, mask, w):
        return jnp.sum(modulated_deform_conv(x, offset, mask, w, 1, 1) ** 2)

    grads = jax.grad(f, argnums=(0, 1, 2, 3))(x, offset, mask, w)
    for g_ in grads:
        assert np.all(np.isfinite(np.asarray(g_)))
        assert np.abs(np.asarray(g_)).max() > 0
