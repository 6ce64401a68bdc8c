"""Merged-hidden CenterHead == per-subhead execution (same params).

The merged path (center_head.py, HEAD_MERGED) concatenates the 7 subheads'
conv_0+BN+relu into one conv + one BN — per-channel math identical; these
tests pin parameter-tree equality, forward equality (f32 tight / bf16
loose), and running-stat update equality.
"""

import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from radardistill_tpu.models.center_head import CenterHead, HeadSpec
from radardistill_tpu.utils.testing import CLASS_NAMES, HEADS_GROUPS


def _mk(dtype):
    spec = HeadSpec(HEADS_GROUPS, CLASS_NAMES)
    head = CenterHead(spec=spec, shared_channels=32, dtype=dtype)
    rng = np.random.RandomState(0)
    x = jnp.asarray(rng.randn(2, 16, 16, 128).astype(np.float32))
    if dtype is not None:
        x = x.astype(dtype)
    return head, x


def _apply(head, variables, x, train, merged):
    old = os.environ.get("HEAD_MERGED")
    os.environ["HEAD_MERGED"] = "1" if merged else "0"
    try:
        return head.apply(variables, x, train, mutable=["batch_stats"])
    finally:
        if old is None:
            os.environ.pop("HEAD_MERGED", None)
        else:
            os.environ["HEAD_MERGED"] = old


def test_param_tree_identical():
    head, x = _mk(None)
    os.environ["HEAD_MERGED"] = "1"
    v_m = head.init(jax.random.PRNGKey(0), x, True)
    os.environ["HEAD_MERGED"] = "0"
    v_u = head.init(jax.random.PRNGKey(0), x, True)
    os.environ.pop("HEAD_MERGED", None)
    assert jax.tree_util.tree_structure(v_m) == jax.tree_util.tree_structure(v_u)
    for (pa, a), (_, b) in zip(
        jax.tree_util.tree_leaves_with_path(v_m),
        jax.tree_util.tree_leaves_with_path(v_u),
    ):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b), err_msg=str(pa))


@pytest.mark.parametrize("train", [True, False])
# bf16: fused-vs-separate rounding can flip single elements near relu/ULP
# boundaries (f32 passes at 1e-5, pinning the math) -> looser element bound
@pytest.mark.parametrize("dtype,rtol", [(None, 1e-5), (jnp.bfloat16, 6e-2)])
def test_merged_matches_unmerged(train, dtype, rtol):
    head, x = _mk(dtype)
    variables = head.init(jax.random.PRNGKey(1), x, False)
    # non-trivial BN stats so the eval path is exercised meaningfully
    variables = jax.tree.map(
        lambda a: a + 0.05 * np.random.RandomState(2).standard_normal(a.shape).astype(np.asarray(a).dtype)
        if np.asarray(a).dtype in (np.float32,) else a, variables)

    out_m, up_m = _apply(head, variables, x, train, merged=True)
    out_u, up_u = _apply(head, variables, x, train, merged=False)
    for k in out_u:
        a = np.asarray(out_m[k], np.float32)
        b = np.asarray(out_u[k], np.float32)
        np.testing.assert_allclose(a, b, rtol=rtol, atol=rtol, err_msg=k)
    if train:
        for (pa, a), (_, b) in zip(
            jax.tree_util.tree_leaves_with_path(up_m["batch_stats"]),
            jax.tree_util.tree_leaves_with_path(up_u["batch_stats"]),
        ):
            np.testing.assert_allclose(
                np.asarray(a), np.asarray(b), rtol=1e-5, atol=1e-6,
                err_msg=str(pa))
