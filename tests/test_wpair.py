"""W-paired fused fp links for C=64 stages (teacher stage 2).

The W-pair layout ((B,H,W,C) -> (B,H,W/2,2C), a free contiguous reshape)
makes the C=64 stride-1 convs exactly lane-aligned (K=128, N=384) for the
fused Pallas links. Contract: same math as the plain masked-dense eval
path — conv+bias, eval-BN, relu, mask; residual on the second link.
"""

import jax
import jax.numpy as jnp
import numpy as np

from radardistill_tpu.models.backbone_s2d import wpair_kernel
from radardistill_tpu.models.backbone_sparse2d import SparseBasicBlock


def test_wpair_kernel_conv_equivalence():
    """XLA-level: conv on the W-paired layout with wpair_kernel(k) equals
    the original conv (stride 1, pad 1) after reshape-back."""
    kx, kk = jax.random.split(jax.random.PRNGKey(0))
    B, H, W, C = 2, 6, 10, 4
    x = jax.random.normal(kx, (B, H, W, C), jnp.float32)
    k = jax.random.normal(kk, (3, 3, C, C), jnp.float32) * 0.3

    ref = jax.lax.conv_general_dilated(
        x, k, (1, 1), ((1, 1), (1, 1)),
        dimension_numbers=("NHWC", "HWIO", "NHWC"))

    xw = x.reshape(B, H, W // 2, 2 * C)
    yw = jax.lax.conv_general_dilated(
        xw, wpair_kernel(k), (1, 1), ((1, 1), (1, 1)),
        dimension_numbers=("NHWC", "HWIO", "NHWC"))
    np.testing.assert_allclose(
        np.asarray(yw.reshape(B, H, W, C)), np.asarray(ref),
        rtol=1e-5, atol=1e-5)


def test_sparse_basic_block_wpair_matches_plain():
    """SparseBasicBlock(C=64, fp_block=True) — which auto-routes C=64
    through the W-paired links — matches the plain masked-dense eval
    forward on the same params."""
    B, H, W, C = 1, 8, 16, 64
    kx, km = jax.random.split(jax.random.PRNGKey(1))
    x = jax.random.normal(kx, (B, H, W, C), jnp.float32)
    mask = (jax.random.uniform(km, (B, H, W)) > 0.4).astype(jnp.float32)
    x = x * mask[..., None]

    plain = SparseBasicBlock(C, fp_block=False)
    fused = SparseBasicBlock(C, fp_block=True)
    v = plain.init(jax.random.PRNGKey(2), x, mask, False)
    # non-default BN stats so the eval affine is non-trivial
    v = jax.tree.map(lambda a: a, v)
    bs = jax.tree.map(
        lambda a: a + 0.3 * jnp.arange(a.size, dtype=a.dtype).reshape(a.shape)
        / a.size, v["batch_stats"])
    v = {"params": v["params"], "batch_stats": bs}

    y_ref = plain.apply(v, x, mask, False)
    y_fused = fused.apply(v, x, mask, False)
    assert y_fused.shape == y_ref.shape == (B, H, W, C)
    np.testing.assert_allclose(np.asarray(y_fused), np.asarray(y_ref),
                               rtol=2e-4, atol=2e-4)
    # masked-out sites are exact zeros on both paths
    assert float(jnp.abs(y_fused * (1 - mask[..., None])).max()) == 0.0
