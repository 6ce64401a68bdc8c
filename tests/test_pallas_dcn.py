"""Pallas DCN kernels (ops/pallas_dcn.py) vs the XLA reference formulation
(ops/dcn.py::_modulated_deform_conv_xla) — interpret mode, f32, so forward
values match to float-associativity tolerance and ALL FOUR gradients
(x, offset, mask, weight) match jax.grad of the reference.

Shapes are production-like (the kernels are specialized to the CMA sites:
stride 2, pad 1, K=3, H≥32, H%10==0, W%45==0, Ho≥24, Wo≥40); channel count
shrunk for test speed. Offsets are kept inside the ±max_offset clamp window
where the kernel must be EXACT; a separate case checks the clamp semantics.
"""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from radardistill_tpu.ops.dcn import _modulated_deform_conv_xla
from radardistill_tpu.ops import pallas_dcn as pdcn


def _make_case(seed, B=1, H=90, W=90, C=128, off_scale=3.0):
    rng = np.random.RandomState(seed)
    Ho, Wo = H // 2, W // 2
    x = rng.randn(B, H, W, C).astype(np.float32)
    # keep offsets strictly inside the ±8 clamp window, where the kernel
    # must match the reference exactly (clamp semantics tested separately)
    offset = np.clip(
        (off_scale * rng.randn(B, Ho, Wo, 18)), -7.9, 7.9
    ).astype(np.float32)
    mask = rng.rand(B, Ho, Wo, 9).astype(np.float32) * 0.9 + 0.05
    weight = (rng.randn(3, 3, C, 32) / np.sqrt(9 * C)).astype(np.float32)
    return map(jnp.asarray, (x, offset, mask, weight))


def _mxu(x, offset, mask, weight):
    return pdcn.modulated_deform_conv_mxu(
        x, offset, mask, weight, 2, 1, 8, True)  # interpret=True


def _ref(x, offset, mask, weight):
    return _modulated_deform_conv_xla(x, offset, mask, weight, stride=2, padding=1)


def test_forward_matches_reference():
    x, offset, mask, weight = _make_case(0)
    got = _mxu(x, offset, mask, weight)
    want = _ref(x, offset, mask, weight)
    assert got.shape == want.shape
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=2e-5, atol=2e-5)


def test_forward_boundary_offsets():
    """Samples pushed off the grid edge must read exact zeros (the reference
    zero-padding semantics) — large but in-window offsets at the borders."""
    x, offset, mask, weight = _make_case(1, off_scale=0.0)
    offset = offset.at[:, 0, :, ::2].set(-7.3)    # off the top
    offset = offset.at[:, -1, :, ::2].set(7.9)    # off the bottom
    offset = offset.at[:, :, 0, 1::2].set(-6.6)   # off the left
    offset = offset.at[:, :, -1, 1::2].set(6.1)   # off the right
    got = _mxu(x, offset, mask, weight)
    want = _ref(x, offset, mask, weight)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=2e-5, atol=2e-5)


def test_gradients_match_reference():
    x, offset, mask, weight = _make_case(2, C=128)
    dy = jnp.asarray(np.random.RandomState(3).randn(1, 45, 45, 32).astype(np.float32))

    def loss_mxu(*args):
        return jnp.sum(_mxu(*args) * dy)

    def loss_ref(*args):
        return jnp.sum(_ref(*args) * dy)

    g_mxu = jax.grad(loss_mxu, argnums=(0, 1, 2, 3))(x, offset, mask, weight)
    g_ref = jax.grad(loss_ref, argnums=(0, 1, 2, 3))(x, offset, mask, weight)
    names = ("dx", "doffset", "dmask", "dweight")
    for name, a, b in zip(names, g_mxu, g_ref):
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), rtol=5e-4, atol=5e-4,
            err_msg=f"{name} mismatch")


def test_clamp_semantics():
    """|Δ| > max_offset: value equals the reference evaluated at the clamped
    offset, and the offset gradient is zero there (clip pass-through)."""
    x, offset, mask, weight = _make_case(4, off_scale=0.0)
    offset = offset.at[:, 12, 13, 4].set(25.0)   # way out of window
    offset = offset.at[:, 12, 13, 5].set(-25.0)
    got = _mxu(x, offset, mask, weight)
    clamped = jnp.clip(offset, -8, 8)
    want = _ref(x, clamped, mask, weight)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=2e-5, atol=2e-5)

    g = jax.grad(lambda o: jnp.sum(_mxu(x, o, mask, weight) ** 2))(offset)
    assert float(g[0, 12, 13, 4]) == 0.0
    assert float(g[0, 12, 13, 5]) == 0.0


def test_shapes_supported_gate():
    assert pdcn.shapes_supported((2, 180, 180, 256), (2, 90, 90, 18), 2, 1, 3)
    assert pdcn.shapes_supported((2, 90, 90, 256), (2, 45, 45, 18), 2, 1, 3)
    assert not pdcn.shapes_supported((2, 24, 24, 256), (2, 12, 12, 18), 2, 1, 3)
    assert not pdcn.shapes_supported((2, 180, 180, 256), (2, 90, 90, 18), 1, 1, 3)
    assert not pdcn.shapes_supported((2, 180, 180, 96), (2, 90, 90, 18), 2, 1, 3)


def test_gradients_match_reference_r5():
    """The production operating point: R=5 windows (patch 16 / grad 16 rows)
    — the R-derived window formulas must stay exact at the smaller size."""
    x, offset, mask, weight = _make_case(7, C=128, off_scale=1.5)
    offset = jnp.clip(offset, -4.9, 4.9)
    dy = jnp.asarray(
        np.random.RandomState(8).randn(1, 45, 45, 32).astype(np.float32))

    def loss_mxu(*args):
        return jnp.sum(pdcn.modulated_deform_conv_mxu(
            *args, 2, 1, 5, True) * dy)

    def loss_ref(*args):
        return jnp.sum(_ref(*args) * dy)

    np.testing.assert_allclose(
        np.asarray(pdcn.modulated_deform_conv_mxu(
            x, offset, mask, weight, 2, 1, 5, True)),
        np.asarray(_ref(x, offset, mask, weight)), rtol=2e-5, atol=2e-5)
    g_mxu = jax.grad(loss_mxu, argnums=(0, 1, 2, 3))(x, offset, mask, weight)
    g_ref = jax.grad(loss_ref, argnums=(0, 1, 2, 3))(x, offset, mask, weight)
    for name, a, b in zip(("dx", "doffset", "dmask", "dweight"), g_mxu, g_ref):
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), rtol=5e-4, atol=5e-4,
            err_msg=f"{name} mismatch")
