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


def test_sorted_bilinear_matches_plain_formulation():
    """The sorted-domain bilinear gather (one argsort + monotone corner
    indices + custom-VJP permutes) must match the plain formulation in both
    value and gradients (x, offsets near boundaries included)."""
    import jax
    import jax.numpy as jnp
    import numpy as np

    from radardistill_tpu.ops.dcn import _bilinear_gather

    def plain(x_flat, h, w, H, W):
        h0 = jnp.floor(h)
        w0 = jnp.floor(w)
        dh = h - h0
        dw = w - w0
        out = 0.0
        for (hi, wi, wt) in (
            (h0, w0, (1 - dh) * (1 - dw)),
            (h0, w0 + 1, (1 - dh) * dw),
            (h0 + 1, w0, dh * (1 - dw)),
            (h0 + 1, w0 + 1, dh * dw),
        ):
            ok = (hi >= 0) & (hi < H) & (wi >= 0) & (wi < W)
            idx = (jnp.clip(hi, 0, H - 1).astype(jnp.int32) * W
                   + jnp.clip(wi, 0, W - 1).astype(jnp.int32))
            vals = jnp.take(x_flat, idx.reshape(-1), axis=0).reshape(
                idx.shape + (x_flat.shape[-1],))
            out = out + vals * (wt * ok)[..., None].astype(x_flat.dtype)
        return out

    rng = np.random.RandomState(0)
    H = W = 12
    C = 5
    M = 200
    x = jnp.asarray(rng.randn(H * W, C).astype(np.float32))
    # coords spanning interior, boundary, and out-of-range (both sides)
    h = jnp.asarray(rng.uniform(-3, H + 3, M).astype(np.float32))
    w = jnp.asarray(rng.uniform(-3, W + 3, M).astype(np.float32))
    cot = jnp.asarray(rng.randn(M, C).astype(np.float32))

    v1 = _bilinear_gather(x, h, w, H, W)
    v2 = plain(x, h, w, H, W)
    np.testing.assert_allclose(np.asarray(v1), np.asarray(v2), rtol=1e-5, atol=1e-6)

    def loss(fn, x, h, w):
        return jnp.sum(fn(x, h, w, H, W) * cot)

    g1 = jax.grad(loss, argnums=(1, 2, 3))(_bilinear_gather, x, h, w)
    g2 = jax.grad(loss, argnums=(1, 2, 3))(plain, x, h, w)
    for a, b in zip(g1, g2):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=1e-4, atol=1e-5)
