"""Int8 frozen-teacher conv path (VERDICT r2 next #2).

The teacher backbone is forward-only (stop_gradient + eval-BN,
pillarnet.py:17-33), so its convs can run as dynamic symmetric int8 —
per-tensor activation scales, per-output-channel weight scales, int32 MXU
accumulation (2x bf16 peak on v5e; measured tools/int8_bench.py).

Quality bound asserted here: whole-backbone relative feature error vs the
f32 path on the SAME params stays small (measured ~2.5% at every scale).
The speed claim is measured on hardware (PERF.md r3 int8 section).
"""

import jax
import jax.numpy as jnp
import numpy as np

from radardistill_tpu.models.backbone_s2d import PillarRes18BackBone8xS2D
from radardistill_tpu.models.backbone_sparse2d import PillarRes18BackBone8x


def _inputs(seed=0, grid=96):
    rng = np.random.RandomState(seed)
    mask = (rng.rand(1, grid, grid) < 0.15).astype(np.float32)
    bev = rng.randn(1, grid, grid, 32).astype(np.float32) * mask[..., None]
    return jnp.asarray(bev), jnp.asarray(mask)


def test_int8_s2d_close_to_f32():
    bev, mask = _inputs()
    m_f = PillarRes18BackBone8xS2D(dtype=jnp.float32)
    m_q = PillarRes18BackBone8xS2D(dtype=jnp.float32, int8=True)
    v = m_f.init(jax.random.PRNGKey(0), bev, mask, False)
    # identical param tree: the int8 path must consume the same checkpoint
    assert jax.tree.structure(m_q.init(
        jax.random.PRNGKey(0), bev, mask, False)) == jax.tree.structure(v)
    of = m_f.apply(v, bev, mask, False)
    oq = m_q.apply(v, bev, mask, False)
    for k in ("x_conv3", "x_conv4", "x_conv5"):
        a = np.asarray(of[k], np.float32)
        b = np.asarray(oq[k], np.float32)
        rel = np.linalg.norm(a - b) / (np.linalg.norm(a) + 1e-9)
        assert 0 < rel < 0.06, (k, rel)  # quantized AND close


def test_int8_dense_close_to_f32():
    bev, mask = _inputs(seed=1)
    m_f = PillarRes18BackBone8x(dtype=jnp.float32)
    m_q = PillarRes18BackBone8x(dtype=jnp.float32, int8=True)
    v = m_f.init(jax.random.PRNGKey(0), bev, mask, False)
    of = m_f.apply(v, bev, mask, False)
    oq = m_q.apply(v, bev, mask, False)
    for k in ("x_conv4", "x_conv5"):
        a = np.asarray(of[k], np.float32)
        b = np.asarray(oq[k], np.float32)
        rel = np.linalg.norm(a - b) / (np.linalg.norm(a) + 1e-9)
        assert 0 < rel < 0.06, (k, rel)


def test_int8_s2d_matches_dense_int8_tree():
    """S2D-int8 and dense-int8 share the checkpoint layout (both must keep
    the plain PillarRes18BackBone8x tree — the interop invariant)."""
    bev, mask = _inputs(seed=2)
    v_d = PillarRes18BackBone8x(dtype=jnp.float32, int8=True).init(
        jax.random.PRNGKey(0), bev, mask, False)
    v_s = PillarRes18BackBone8xS2D(dtype=jnp.float32, int8=True).init(
        jax.random.PRNGKey(0), bev, mask, False)
    flat_d = {jax.tree_util.keystr(k) for k, _ in
              jax.tree_util.tree_flatten_with_path(v_d["params"])[0]}
    flat_s = {jax.tree_util.keystr(k) for k, _ in
              jax.tree_util.tree_flatten_with_path(v_s["params"])[0]}
    assert flat_d == flat_s


import pytest


@pytest.mark.parametrize("pack_stage2,stages", [
    (False, 1), (True, 1), (False, 3), (False, 5)])
def test_int8_static_chain_close_to_f32(pack_stage2, stages):
    """Static chain (BN-derived bounds, int8 activations between convs):
    same checkpoint, bounded feature error, train-mode falls back to float
    exactly. pack_stage2=True extends the Pallas chain through the packed
    stage-2 (360-class grid, C=256 / N=768 links); stages>1 extends the
    UNPACKED chain through the later stages (strided downs as 2x2 convs on
    the space-to-depth packing of the int8 carry, stage-4/5 exercising the
    kernel's internal W-pad + small-BH paths).

    The analytic bound max(|β| + K|γ|) describes post-BN activations when
    the running statistics describe the data — true for any trained/frozen
    teacher, NOT at random init (running var 1 vs actual conv-out var ~0.25,
    so the bound is ~2x loose and the int8 step noise compounds). The test
    therefore adapts the running stats to the input first (the float path
    is unaffected by stats scale)."""
    bev, mask = _inputs(seed=3)
    m_f = PillarRes18BackBone8xS2D(dtype=jnp.float32, pack_stage2=pack_stage2)
    m_q = PillarRes18BackBone8xS2D(dtype=jnp.float32, int8_static=True,
                                   pack_stage2=pack_stage2,
                                   int8_stages=stages)
    v = m_f.init(jax.random.PRNGKey(0), bev, mask, False)
    assert jax.tree.structure(m_q.init(
        jax.random.PRNGKey(0), bev, mask, False)) == jax.tree.structure(v)
    # adapt running stats (momentum 0.01 -> ~95% in 300 steps)
    apply_t = jax.jit(lambda v, b, m: m_f.apply(
        v, b, m, True, mutable=["batch_stats"])[1])
    v = dict(v)
    for _ in range(300):
        v["batch_stats"] = apply_t(v, bev, mask)["batch_stats"]
    of = m_f.apply(v, bev, mask, False)
    oq = m_q.apply(v, bev, mask, False)
    tol = 0.08 if stages == 1 else 0.16  # requant hops compound down-chain
    for k in ("x_conv3", "x_conv4", "x_conv5"):
        a = np.asarray(of[k], np.float32)
        b = np.asarray(oq[k], np.float32)
        rel = np.linalg.norm(a - b) / (np.linalg.norm(a) + 1e-9)
        assert 0 < rel < tol, (k, rel)
    # train-mode: the static flag must be inert (float path, bit-identical)
    ot, _ = m_f.apply(v, bev, mask, True, mutable=["batch_stats"])
    oqt, _ = m_q.apply(v, bev, mask, True, mutable=["batch_stats"])
    for k in ("x_conv3", "x_conv4", "x_conv5"):
        np.testing.assert_array_equal(np.asarray(ot[k]), np.asarray(oqt[k]))
