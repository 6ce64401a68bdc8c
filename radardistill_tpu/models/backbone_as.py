"""PillarRes18 backbone — active-site (gather-scatter) sparse formulation.

The TPU answer to spconv (reference:
pcdet/models/backbones_3d/spconv_backbone_2d.py:208-324 built on
SubMConv2d/SparseConv2d): compute and HBM traffic scale with the number of
active sites, not grid area. Round 1's masked-dense backbone is exactly
equivalent numerically but moves the full dense pyramid (265 MB bf16 per
C=32 map at 1440²) through every conv — the measured 641 GB/step made the
train step bandwidth-bound at ~2.5 samples/s (PERF.md). Here the fine
strides run on fixed-capacity active-site tables (ops/active_site.py) and
the pyramid is only densified at a configurable stage (default stride 4),
where occupancy and map size make dense compute the better trade.

Parameter-tree compatibility: every scope/param name and shape matches
``backbone_sparse2d.PillarRes18BackBone8x`` exactly (conv1_0/conv1/conv/
kernel, .../bn1/scale, ...), so the two formulations share checkpoints and
the equivalence test initializes one and applies both.

Per-stage layout mirrors the reference:
    conv1: 2x SparseBasicBlock(32)                 stride 1
    conv2: SparseConv2d(32->64, s2) + 2x block     stride 2
    conv3: SparseConv2d(64->128, s2) + 2x block    stride 4
    conv4: SparseConv2d(128->256, s2) + 2x block   stride 8
    conv5: dense Conv(256, s2) + 2x dense block    stride 16
"""

from __future__ import annotations

from typing import Any, Dict, Tuple

import jax
import jax.numpy as jnp
from flax import linen as nn

from ..ops import active_site as asx
from .backbone_sparse2d import DenseBasicBlock, SparseBasicBlock, SparseDownBlock
from .layers import (
    BN_EPS_BACKBONE,
    BN_MOM_BACKBONE,
    BatchNormTorch,
    Conv2dTorch,
    MaskedBatchNorm,
    conv_kernel_init_torch,
)


class _ConvCore(nn.Module):
    """Holds the conv params under a child scope named ``conv`` so the param
    path matches Conv2dTorch (<parent>/conv/kernel) for checkpoint interop."""

    features: int
    use_bias: bool
    dtype: Any = None

    @nn.compact
    def __call__(self, feats, tap):
        ci = feats.shape[-1]
        kernel = self.param("kernel", conv_kernel_init_torch, (3, 3, ci, self.features))
        bias = (
            self.param("bias", nn.initializers.zeros, (self.features,))
            if self.use_bias
            else None
        )
        dt = self.dtype or feats.dtype
        return asx.conv3x3_as_b(
            feats.astype(dt), tap, kernel.astype(dt),
            None if bias is None else bias, out_dtype=dt,
        )


class ASConv(nn.Module):
    """3x3 active-site conv (batched). tap = (nb, msk, inv, imsk), each
    (B, 9, cap) — built once per stage by the backbone (invert_taps gives the
    gather-formulated backward, ops/active_site.py)."""

    features: int
    use_bias: bool = False
    dtype: Any = None

    @nn.compact
    def __call__(self, feats, tap):
        return _ConvCore(self.features, self.use_bias, self.dtype, name="conv")(
            feats, tap
        )


class SparseBasicBlockAS(nn.Module):
    """Residual submanifold block on site tables — same algebra (and scope
    names) as backbone_sparse2d.SparseBasicBlock."""

    features: int
    dtype: Any = None

    @nn.compact
    def __call__(self, x, tap, valid, train):
        m = valid[..., None].astype(x.dtype)
        y = ASConv(self.features, True, self.dtype, name="conv1")(x, tap)
        y = MaskedBatchNorm(BN_EPS_BACKBONE, BN_MOM_BACKBONE, self.dtype, name="bn1")(
            y, valid, train
        )
        y = nn.relu(y) * m
        y = ASConv(self.features, True, self.dtype, name="conv2")(y, tap)
        y = MaskedBatchNorm(BN_EPS_BACKBONE, BN_MOM_BACKBONE, self.dtype, name="bn2")(
            y, valid, train
        )
        return nn.relu(y + x) * m


class SparseDownBlockAS(nn.Module):
    """Strided SparseConv2d + BN + ReLU on site tables (index tables are
    built by the backbone and shared)."""

    features: int
    dtype: Any = None

    @nn.compact
    def __call__(self, x, tap, new_valid, train):
        y = ASConv(self.features, False, self.dtype, name="conv")(x, tap)
        y = MaskedBatchNorm(BN_EPS_BACKBONE, BN_MOM_BACKBONE, self.dtype, name="bn")(
            y, new_valid, train
        )
        return nn.relu(y) * new_valid[..., None].astype(y.dtype)



def _tap32(tap):
    """Upcast host-shipped uint16 rulebook indices to s32 (the loader
    narrows them for transfer bandwidth — host_precompute.as_tables); the
    three casts are elementwise and fuse into the consuming gathers."""
    import jax.numpy as jnp

    return tuple(
        t.astype(jnp.int32) if t.dtype == jnp.uint16 else t for t in tap
    )


class PillarRes18BackBone8xAS(nn.Module):
    """Active-site PillarRes18 encoder.

    Input: feats (B, cap1, 32) pillar table + uids (B, cap1) sorted linear
    site ids (sentinel = H*W) from the sparse VFE. ``hw`` is the static
    (H, W) of the stride-1 grid.

    ``dense_from`` picks the first stage (2..5) executed masked-dense; the
    earlier stages run on site tables with per-stage capacities ``caps``
    (entries are clipped to the stage grid area, so generous defaults are
    safe on small test grids). Sites beyond a stage capacity are dropped
    largest-id-first — choose capacities from data statistics (tests assert
    no overflow at the shipped configs).
    """

    hw: Tuple[int, int]
    dtype: Any = None
    caps: Tuple[int, ...] = (65536, 49152, 32768, 24576)
    dense_from: int = 3
    densify_all: bool = False
    channels = (32, 64, 128, 256, 256)

    @nn.compact
    def __call__(self, feats, uids, train: bool, tables=None) -> Dict[str, jnp.ndarray]:
        h, w = self.hw
        assert 2 <= self.dense_from <= 5, self.dense_from
        caps = [min(c, (h // s) * (w // s)) for c, s in zip(self.caps, (1, 2, 4, 8))]
        cap1 = caps[0]
        assert feats.shape[1] == cap1, (
            f"VFE table capacity {feats.shape[1]} != backbone caps[0] {cap1}"
        )

        out: Dict[str, Any] = {}
        valid = uids < h * w
        x = feats * valid[..., None].astype(feats.dtype)

        # ``tables`` (optional): host-built rulebooks + per-stage active sets
        # (data/host_precompute.as_tables) — the device then pays ZERO for
        # index-table construction (~16 ms/step of 2-8 GB/s s32 glue, PERF.md
        # r3d). Bit-identical to the device build below (tested); the device
        # build remains the synthetic/dryrun path and the test oracle.

        # ---- stage 1: submanifold at stride 1 (always sparse: the input is
        # a table and the 1440² dense map is what we refuse to materialize)
        if tables is not None:
            tap = _tap32(tables["tap1"])
        else:
            grid = jax.vmap(lambda u: asx.site_index_grid(u, h * w, cap1))(uids)
            nb, msk = asx.conv_neighbor_table_b(uids, grid, (h, w), w, 1, cap1)
            tap = (nb, msk) + asx.invert_taps_b(nb, msk, cap1)
        x = SparseBasicBlockAS(32, self.dtype, name="conv1_0")(x, tap, valid, train)
        x = SparseBasicBlockAS(32, self.dtype, name="conv1_1")(x, tap, valid, train)
        out["as1"] = (x, uids)

        stage_specs = [  # (stage_idx, features, cap_idx)
            (2, 64), (3, 128), (4, 256),
        ]
        sh, sw, cap_in = h, w, cap1
        dense_x = dense_mask = None
        # sites silently dropped by capacity caps, summed over batch+stages —
        # a monitoring counter (logged as tb `as_overflow`); nonzero means
        # MAX_ACTIVE needs raising for this data
        overflow = jnp.zeros((), jnp.int32)
        for stage, feat_ch in stage_specs:
            if stage < self.dense_from:
                # sparse down + 2 sparse blocks
                cap_out = caps[stage - 1]
                if tables is not None:
                    new_uids = tables[f"uids{stage}"]
                    _cnt = tables["counts"][:, stage - 2]
                    tap_d = _tap32(tables[f"dtap{stage}"])
                else:
                    new_uids, _cnt = jax.vmap(
                        lambda u: asx.downsample_active(u, (sh, sw), cap_out)
                    )(uids)
                    nb_d, msk_d = asx.conv_neighbor_table_b(
                        new_uids, grid, (sh, sw), sw // 2, 2, cap_in
                    )
                    tap_d = (nb_d, msk_d) + asx.invert_taps_b(nb_d, msk_d, cap_in)
                overflow = overflow + jnp.sum(jnp.maximum(_cnt - cap_out, 0))
                sh, sw, cap_in, uids = sh // 2, sw // 2, cap_out, new_uids
                valid = uids < sh * sw
                x = SparseDownBlockAS(feat_ch, self.dtype, name=f"conv{stage}_down")(
                    x, tap_d, valid, train
                )
                if tables is not None:
                    tap = _tap32(tables[f"tap{stage}"])
                else:
                    grid = jax.vmap(lambda u: asx.site_index_grid(u, sh * sw, cap_in))(uids)
                    nb, msk = asx.conv_neighbor_table_b(uids, grid, (sh, sw), sw, 1, cap_in)
                    tap = (nb, msk) + asx.invert_taps_b(nb, msk, cap_in)
                x = SparseBasicBlockAS(feat_ch, self.dtype, name=f"conv{stage}_0")(
                    x, tap, valid, train
                )
                x = SparseBasicBlockAS(feat_ch, self.dtype, name=f"conv{stage}_1")(
                    x, tap, valid, train
                )
                out[f"as{stage}"] = (x, uids)
            else:
                if dense_x is None:  # hand off: densify the current table
                    dense_x, dense_mask = asx.densify_batch(x, uids, (sh, sw))
                dense_x, dense_mask = SparseDownBlock(
                    feat_ch, self.dtype, name=f"conv{stage}_down"
                )(dense_x, dense_mask, train)
                dense_x = SparseBasicBlock(feat_ch, self.dtype, name=f"conv{stage}_0")(
                    dense_x, dense_mask, train
                )
                dense_x = SparseBasicBlock(feat_ch, self.dtype, name=f"conv{stage}_1")(
                    dense_x, dense_mask, train
                )
                sh, sw = sh // 2, sw // 2
                out[f"x_conv{stage}"] = dense_x
                out[f"mask{stage}"] = dense_mask

        if dense_x is None:  # dense_from == 5: densify conv4's table output
            dense_x, dense_mask = asx.densify_batch(x, uids, (sh, sw))
            out["x_conv4"], out["mask4"] = dense_x, dense_mask

        # ---- conv5: dense stride-2 stage (reference runs dense here too)
        y = Conv2dTorch(256, 3, 2, 1, use_bias=False, dtype=self.dtype,
                        name="conv5_down_conv")(dense_x)
        y = BatchNormTorch(BN_EPS_BACKBONE, BN_MOM_BACKBONE, dtype=self.dtype,
                           name="conv5_down_bn")(y, train)
        y = nn.relu(y)
        y = DenseBasicBlock(256, self.dtype, name="conv5_0")(y, train)
        out["x_conv5"] = DenseBasicBlock(256, self.dtype, name="conv5_1")(y, train)

        out["as_overflow"] = overflow

        if self.densify_all:  # tests / analytics only
            for stage, s in ((1, 1), (2, 2), (3, 4), (4, 8)):
                if f"as{stage}" in out:
                    f_, u_ = out[f"as{stage}"]
                    d_, m_ = asx.densify_batch(f_, u_, (h // s, w // s))
                    out[f"x_conv{stage}"], out[f"mask{stage}"] = d_, m_
        return out
