"""v2 fused conv-block kernel (ops/pallas_conv_block.py) — interpret-mode
equivalences: int8 v2 vs v1 (bit-exact), bf16 link vs the XLA float path.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from radardistill_tpu.models.layers import int8_qkernel, q8
from radardistill_tpu.ops.pallas_conv_block import fp_block_conv, int8_block_conv_v2
from radardistill_tpu.ops.pallas_int8_conv import int8_block_conv


def _mk_int8(seed, b=2, h=16, w=24, c=32, co=32, kh=3):
    rng = np.random.RandomState(seed)
    xq = jnp.asarray(rng.randint(-127, 128, (b, h, w, c)), jnp.int8)
    k = rng.randn(kh, kh, c, co).astype(np.float32) * 0.1
    kq, sw = int8_qkernel(jnp.asarray(k))
    gt = jnp.asarray(rng.rand(co).astype(np.float32) + 0.5)
    sh = jnp.asarray(rng.randn(co).astype(np.float32) * 0.1)
    bias = jnp.asarray(rng.randn(co).astype(np.float32) * 0.1)
    bound = jnp.asarray(3.0, jnp.float32)
    mask = (rng.rand(b, h, w) > 0.3).astype(np.int8)
    return xq, kq, sw, bias, gt, sh, bound, mask


@pytest.mark.parametrize("kh,zero", [(3, 0.0), (3, 127.0), (2, 127.0)])
def test_int8_v2_matches_v1(kh, zero):
    xq, kq, sw, bias, gt, sh, bound, mask = _mk_int8(0, kh=kh)
    co = kq.shape[-1]
    xc = (xq, jnp.asarray(2.0, jnp.float32), zero)
    mq_full = jnp.broadcast_to(
        jnp.asarray(mask)[..., None], xq.shape[:3] + (co,)).astype(jnp.int8)
    q1, b1, z1 = int8_block_conv(xc, kq, sw, bias, gt, sh, bound, mq_full)
    q2, b2, z2 = int8_block_conv_v2(
        xc, kq, sw, bias, gt, sh, bound, jnp.asarray(mask)[..., None])
    np.testing.assert_array_equal(np.asarray(q1), np.asarray(q2))
    np.testing.assert_allclose(float(b1), float(b2))
    assert z1 == z2


def test_int8_v2_matches_v1_residual_and_phases():
    """Packed-grid (nph=4) mask + residual carry, vs v1's lane-expanded mask."""
    rng = np.random.RandomState(1)
    b, h, w, nph, c_orig = 2, 8, 16, 4, 32
    c = co = nph * c_orig
    xq, kq, sw, bias, gt, sh, bound, _ = _mk_int8(1, b=b, h=h, w=w, c=c, co=co)
    mask_p = (rng.rand(b, h, w, nph) > 0.3).astype(np.int8)
    mq_full = jnp.asarray(np.repeat(mask_p, c_orig, axis=-1))
    resq = jnp.asarray(rng.randint(-127, 128, (b, h, w, co)), jnp.int8)
    res = (resq, jnp.asarray(1.5, jnp.float32), 127.0)
    xc = (xq, jnp.asarray(2.0, jnp.float32), 127.0)
    q1, b1, _ = int8_block_conv(xc, kq, sw, bias, gt, sh, bound, mq_full, res=res)
    q2, b2, _ = int8_block_conv_v2(
        xc, kq, sw, bias, gt, sh, bound, jnp.asarray(mask_p), res=res)
    np.testing.assert_array_equal(np.asarray(q1), np.asarray(q2))
    np.testing.assert_allclose(float(b1), float(b2))


@pytest.mark.parametrize("fp_stages", [2, 5])
def test_fp_stages_backbone_matches_float(fp_stages):
    """S2D backbone with the fused-fp chain == the plain float path (eval)."""
    from radardistill_tpu.models.backbone_s2d import PillarRes18BackBone8xS2D

    rng = np.random.RandomState(3)
    g = 64
    bev = jnp.asarray(rng.randn(2, g, g, 32).astype(np.float32) * 0.3)
    mask = jnp.asarray(rng.rand(2, g, g) > 0.9)
    bev = bev * mask[..., None]

    m0 = PillarRes18BackBone8xS2D()
    m1 = PillarRes18BackBone8xS2D(fp_stages=fp_stages)
    variables = m0.init(jax.random.PRNGKey(0), bev, mask, False)
    o0 = m0.apply(variables, bev, mask, False)
    o1 = m1.apply(variables, bev, mask, False)
    for k in ("x_conv2", "x_conv3", "x_conv4", "x_conv5"):
        a = np.asarray(o0[k], np.float32)
        b = np.asarray(o1[k], np.float32)
        np.testing.assert_allclose(a, b, rtol=2e-4, atol=2e-4, err_msg=k)


@pytest.mark.parametrize("kh,w,c,co,res", [
    (3, 32, 64, 64, False),    # stage-2 shape class (lane pad co 64->128)
    (3, 24, 64, 64, True),     # w%16 != 0 -> internal W pad; residual add
    (2, 16, 128, 64, False),   # strided (packed-grid) link
    (3, 16, 128, 128, True),   # aligned lanes
])
def test_fp_link_matches_xla_float(kh, w, c, co, res):
    rng = np.random.RandomState(2)
    b, h = 2, 8
    x = jnp.asarray(rng.randn(b, h, w, c).astype(np.float32), jnp.bfloat16)
    k = jnp.asarray(rng.randn(kh, kh, c, co).astype(np.float32) * 0.1)
    gt = jnp.asarray(rng.rand(co).astype(np.float32) + 0.5)
    sh = jnp.asarray(rng.randn(co).astype(np.float32) * 0.1)
    bias = jnp.asarray(rng.randn(co).astype(np.float32) * 0.1)
    mask = (rng.rand(b, h, w) > 0.3).astype(np.float32)
    r = (jnp.asarray(rng.randn(b, h, w, co).astype(np.float32), jnp.bfloat16)
         if res else None)

    got = fp_block_conv(x, k, bias, gt, sh,
                        jnp.asarray(mask, jnp.int8)[..., None], res=r)
    assert got.dtype == jnp.bfloat16

    pad = ((1, 1), (1, 1)) if kh == 3 else ((1, 0), (1, 0))
    y = jax.lax.conv_general_dilated(
        x, k.astype(jnp.bfloat16), (1, 1), pad,
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        preferred_element_type=jnp.float32,
    )
    y = y * gt + (bias * gt + sh)
    if res:
        y = y + r.astype(jnp.float32)
    y = jnp.maximum(y, 0.0) * mask[..., None]
    np.testing.assert_allclose(
        np.asarray(got, np.float32), np.asarray(y.astype(jnp.bfloat16), np.float32),
        rtol=2e-2, atol=2e-2,
    )
