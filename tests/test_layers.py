import numpy as np
import jax
import jax.numpy as jnp

from radardistill_tpu.models.layers import (
    Conv2dTorch,
    ConvTranspose2dTorch,
    MaskedBatchNorm,
    max_pool_mask,
    GRN,
)


def test_conv_matches_torch_geometry():
    import torch

    rng = np.random.RandomState(0)
    x = rng.randn(2, 10, 10, 3).astype(np.float32)
    m = Conv2dTorch(features=5, kernel_size=3, stride=2, padding=1)
    params = m.init(jax.random.PRNGKey(0), jnp.asarray(x))
    y = m.apply(params, jnp.asarray(x))
    assert y.shape == (2, 5, 5, 5)

    w = np.asarray(params["params"]["conv"]["kernel"])  # HWIO
    tconv = torch.nn.Conv2d(3, 5, 3, stride=2, padding=1, bias=False)
    tconv.weight.data = torch.from_numpy(w.transpose(3, 2, 0, 1).copy())
    ty = tconv(torch.from_numpy(x.transpose(0, 3, 1, 2))).detach().numpy().transpose(0, 2, 3, 1)
    np.testing.assert_allclose(np.asarray(y), ty, rtol=1e-4, atol=1e-5)


def test_conv_transpose_matches_torch():
    import torch

    rng = np.random.RandomState(1)
    x = rng.randn(1, 6, 6, 4).astype(np.float32)
    for (k, s, p) in [(4, 2, 1), (2, 2, 0)]:
        m = ConvTranspose2dTorch(features=3, kernel_size=k, stride=s, padding=p)
        params = m.init(jax.random.PRNGKey(0), jnp.asarray(x))
        y = m.apply(params, jnp.asarray(x))
        w = np.asarray(params["params"]["kernel"])  # (k,k,in,out)
        tconv = torch.nn.ConvTranspose2d(4, 3, k, stride=s, padding=p, bias=False)
        # torch ConvTranspose2d weight layout: (in, out, kh, kw)
        tconv.weight.data = torch.from_numpy(w.transpose(2, 3, 0, 1).copy())
        ty = tconv(torch.from_numpy(x.transpose(0, 3, 1, 2))).detach().numpy().transpose(0, 2, 3, 1)
        assert y.shape == ty.shape, (k, s, p, y.shape, ty.shape)
        np.testing.assert_allclose(np.asarray(y), ty, rtol=1e-4, atol=1e-5)


def test_masked_batchnorm_matches_torch_bn1d_on_packed_rows():
    import torch

    rng = np.random.RandomState(2)
    x = rng.randn(4, 50, 8).astype(np.float32)
    mask = rng.rand(4, 50) > 0.4

    m = MaskedBatchNorm(eps=1e-3, momentum=0.01)
    variables = m.init(jax.random.PRNGKey(0), jnp.asarray(x), jnp.asarray(mask), True)
    y, updated = m.apply(
        variables, jnp.asarray(x), jnp.asarray(mask), True, mutable=["batch_stats"]
    )

    tb = torch.nn.BatchNorm1d(8, eps=1e-3, momentum=0.01)
    tb.train()
    packed = torch.from_numpy(x[mask])  # (n_valid, 8) — the spconv layout
    ty = tb(packed).detach().numpy()

    got = np.asarray(y)[mask]
    np.testing.assert_allclose(got, ty, rtol=1e-3, atol=1e-4)
    np.testing.assert_allclose(
        np.asarray(updated["batch_stats"]["mean"]), tb.running_mean.numpy(), rtol=1e-4, atol=1e-6
    )
    np.testing.assert_allclose(
        np.asarray(updated["batch_stats"]["var"]), tb.running_var.numpy(), rtol=1e-4, atol=1e-5
    )


def test_max_pool_mask_matches_sparse_output_rule():
    # output site active iff 3x3 receptive field (stride 2, pad 1) hits input
    m = np.zeros((1, 8, 8), np.float32)
    m[0, 0, 0] = 1
    m[0, 5, 6] = 1
    got = np.asarray(max_pool_mask(jnp.asarray(m), 3, 2, 1))[0]
    want = np.zeros((4, 4))
    for oy in range(4):
        for ox in range(4):
            ys = [oy * 2 - 1 + d for d in range(3)]
            xs = [ox * 2 - 1 + d for d in range(3)]
            want[oy, ox] = any(
                0 <= yy < 8 and 0 <= xx < 8 and m[0, yy, xx] > 0 for yy in ys for xx in xs
            )
    np.testing.assert_array_equal(got, want)


def test_grn_matches_torch_formula():
    rng = np.random.RandomState(3)
    x = rng.randn(2, 5, 5, 6).astype(np.float32)
    m = GRN()
    params = m.init(jax.random.PRNGKey(0), jnp.asarray(x))
    # set gamma nonzero so the normalization path is exercised
    params = jax.tree.map(lambda a: a, params)
    params = {"params": {"gamma": jnp.ones((1, 1, 1, 6)) * 0.5, "beta": jnp.zeros((1, 1, 1, 6))}}
    y = np.asarray(m.apply(params, jnp.asarray(x)))

    gx = np.linalg.norm(x, axis=(1, 2), keepdims=True)  # (2,1,1,6)
    nx = gx / (gx.mean(axis=-1, keepdims=True) + 1e-6)
    want = 0.5 * (x * nx) + x
    np.testing.assert_allclose(y, want, rtol=1e-4, atol=1e-5)
