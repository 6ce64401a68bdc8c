"""TPU smoke for the Pallas DCN kernels at the production CMA shapes.

Catches Mosaic lowering issues that interpret mode is too lax to see
(CLAUDE.md: lane-alignment rules differ) — run after any kernel change,
BEFORE long TPU jobs that embed the kernels. Checks fwd + all four grads
against the XLA reference formulation at both CMA sites.
"""

import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import numpy as np

import jax
import jax.numpy as jnp

from radardistill_tpu.ops.dcn import _modulated_deform_conv_xla
from radardistill_tpu.ops import pallas_dcn as pdcn


def check(B, H, W, C, Co, r=5, tol=2e-2):
    rng = np.random.RandomState(0)
    Ho, Wo = H // 2, W // 2
    x = jnp.asarray(rng.randn(B, H, W, C), jnp.bfloat16)
    off = jnp.asarray(
        np.clip(1.5 * rng.randn(B, Ho, Wo, 18), -4.9, 4.9), jnp.float32)
    m = jnp.asarray(rng.rand(B, Ho, Wo, 9) * 0.9 + 0.05, jnp.float32)
    w = jnp.asarray(rng.randn(3, 3, C, Co) / np.sqrt(9 * C), jnp.float32)
    dy = jnp.asarray(rng.randn(B, Ho, Wo, Co), jnp.bfloat16)

    def loss_k(x, off, m, w):
        return jnp.sum(
            pdcn.modulated_deform_conv_mxu(x, off, m, w, 2, 1, r, False)
            * dy)

    def loss_r(x, off, m, w):
        return jnp.sum(
            _modulated_deform_conv_xla(
                x.astype(jnp.float32), off, m, w, stride=2, padding=1
            ).astype(jnp.bfloat16) * dy)

    t0 = time.time()
    gk = jax.jit(jax.grad(loss_k, argnums=(0, 1, 2, 3)))(x, off, m, w)
    gk = jax.tree.map(np.asarray, gk)
    print(f"  kernel fwd+bwd compiled+ran in {time.time() - t0:.1f}s")
    gr = jax.jit(jax.grad(loss_r, argnums=(0, 1, 2, 3)))(x, off, m, w)
    gr = jax.tree.map(np.asarray, gr)
    for name, a, b in zip(("dx", "doffset", "dmask", "dweight"), gk, gr):
        a32, b32 = np.asarray(a, np.float32), np.asarray(b, np.float32)
        scale = max(np.abs(b32).max(), 1e-6)
        err = np.abs(a32 - b32).max() / scale
        print(f"  {name}: rel max err {err:.3e}")
        assert err < tol, (name, err)


if __name__ == "__main__":
    print("devices:", jax.devices())
    for (B, H, W, C, Co) in ((2, 180, 180, 256, 256), (2, 90, 90, 256, 256)):
        print(f"site B{B} {H}x{W} C{C}->{Co}")
        check(B, H, W, C, Co)
    print("OK")
