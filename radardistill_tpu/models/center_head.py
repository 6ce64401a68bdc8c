"""CenterPoint multi-task head — stacked-heads TPU formulation.

Reference: pcdet/models/dense_heads/center_head.py (CenterHead/SeparateHead,
:11-424) and radar_center_head.py (:12-441, identical math on the radar BEV).

Reference structure: shared 3x3 conv (256→64) + 6 per-task `SeparateHead`s,
each with 7 subheads {hm, center, center_z, dim, rot, vel, iou} of 2 convs.
That is 84 tiny convolutions per forward — poison for the MXU.

TPU re-design — **stacked heads**: the 6 task heads are one parameter stack.
For each subhead type we run ONE grouped conv (`feature_group_count = 6`)
over the shared feature replicated on the channel axis: (B, H, W, 6·64) →
(B, H, W, 6·C_out). Per-channel BN is numerically identical to 6 separate
BNs. The `hm` subhead (1 or 2 classes per task) is padded to the max class
count with a static validity mask. 84 convs → 14 MXU-friendly ones, one
fused graph.

Target assignment is the reference's per-box CPU gaussian loop
(center_head.py:111-235) vectorized on-device: chunked gaussian stamping with
max-reduction over NUM_MAX_OBJS box slots — no host round-trip inside the
train step.
"""

from __future__ import annotations

import math
from functools import partial
from typing import Any, Dict, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn

from ..ops import geometry, nms
from .layers import BatchNormTorch, Conv2dTorch, clip_sigmoid, kaiming_normal_torch

# subhead output channels per task (HEAD_DICT of radar_distill_train.yaml:131-138)
REG_HEADS = (("center", 2), ("center_z", 1), ("dim", 3), ("rot", 2), ("vel", 2), ("iou", 1))


class HeadSpec:
    """Static task-head layout derived from CLASS_NAMES_EACH_HEAD."""

    def __init__(self, class_names_each_head: Sequence[Sequence[str]], class_names: Sequence[str]):
        self.class_names = list(class_names)
        self.heads = [[c for c in group if c in class_names] for group in class_names_each_head]
        self.num_heads = len(self.heads)
        self.max_cls = max(len(h) for h in self.heads)
        # global 1-based class id for each (head, slot); 0 = padded slot
        ids = np.zeros((self.num_heads, self.max_cls), np.int32)
        valid = np.zeros((self.num_heads, self.max_cls), bool)
        for i, group in enumerate(self.heads):
            for j, name in enumerate(group):
                ids[i, j] = self.class_names.index(name) + 1
                valid[i, j] = True
        self.class_ids = ids          # (n_heads, max_cls) global 1-based
        self.class_valid = valid      # (n_heads, max_cls)
        self.total_classes = sum(len(h) for h in self.heads)


class _BlockDiagConv(nn.Module):
    """Grouped 3x3 conv run as a DENSE conv with a block-diagonal kernel.

    Param layout/name identical to the nn.Conv(feature_group_count=n) it
    replaces: kernel (3, 3, Cin/n, n*Co), bias (n*Co,) directly under this
    module's scope. Off-block kernel entries are exact zeros, so the dense
    conv's extra terms contribute nothing — numerics unchanged — while the
    forward/backward run as ordinary full-channel convs on the MXU instead
    of the slow 64-ch grouped weight-grad fusions (r2 profile)."""

    num_heads: int
    out_per_head: int
    kernel_init: Any = None
    bias_init: Any = None
    dtype: Any = None

    @nn.compact
    def __call__(self, x):
        n, co = self.num_heads, self.out_per_head
        cin_g = x.shape[-1] // n
        kern = self.param(
            "kernel", self.kernel_init, (3, 3, cin_g, n * co), jnp.float32
        )
        bias = self.param(
            "bias", self.bias_init or nn.initializers.zeros, (n * co,), jnp.float32
        )
        eye = jnp.eye(n, dtype=kern.dtype)
        dense = (
            kern.reshape(3, 3, cin_g, n, co)[:, :, None, :, :, :]
            * eye[None, None, :, None, :, None]
        ).reshape(3, 3, n * cin_g, n * co)
        dt = self.dtype or x.dtype
        y = jax.lax.conv_general_dilated(
            x.astype(dt), dense.astype(dt), (1, 1), ((1, 1), (1, 1)),
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
        )
        return y + bias.astype(dt)


class StackedSubHead(nn.Module):
    """One subhead type across all task heads: grouped [conv3+BN+ReLU]ⁿ⁻¹ + conv3.

    Matches SeparateHead's per-head stack (center_head.py:20-38): hidden convs
    use bias=USE_BIAS_BEFORE_NORM, final conv bias=True; non-hm convs get
    kaiming-normal init and zero bias; the hm final bias is init_bias=-2.19.
    """

    num_heads: int
    out_channels: int
    num_conv: int = 2
    use_bias: bool = True
    init_bias: float | None = None  # set for 'hm'
    dtype: Any = None

    @nn.compact
    def __call__(self, x, train, phase: str = "full"):
        # x: (B, H, W, C_shared) — UNTILED. The reference tiles x n-ways and
        # runs grouped convs; a grouped conv whose every input group is the
        # same x is exactly a DENSE conv on x with the identical
        # (3,3,C_shared, n*C) kernel, so the first conv folds the tiling
        # away. Later convs (per-head inputs) run as block-diagonal dense
        # convs: grouped 64-ch backward lowers to ~30 TF/s weight-grad
        # fusions (~30 ms/step at bs4, r2 profile) while the dense forms
        # stay on the fast conv path. Param tree unchanged.
        # non-hm subheads get torch kaiming_normal_ init, hm keeps conv
        # defaults (center_head.py:29-36)
        #
        # ``phase`` supports CenterHead's MERGED-hidden execution (same
        # params, one conv+BN+relu across ALL subheads — CenterHead
        # docstring): "pieces" creates/returns the conv_0 + bn_0 params;
        # "tail" consumes the externally normalized hidden slice and runs
        # this subhead's conv_out. "full" = standalone per-subhead path.
        from .layers import conv_kernel_init_torch

        kinit = conv_kernel_init_torch if self.init_bias is not None else kaiming_normal_torch

        def final_bias_init(key, shape, dtype=jnp.float32):
            if self.init_bias is not None:
                return jnp.full(shape, self.init_bias, dtype)
            return jnp.zeros(shape, dtype)

        if phase == "pieces":
            assert self.num_conv == 2, self.num_conv
            k0, b0 = Conv2dTorch(
                self.num_heads * x.shape[-1], 3, 1, 1,
                use_bias=self.use_bias, kernel_init=kinit,
                dtype=self.dtype, name="conv_0",
            )(x, raw=True)
            bnp = BatchNormTorch(dtype=self.dtype, name="bn_0")(
                jnp.zeros((1, self.num_heads * x.shape[-1]), x.dtype),
                train, pieces=True)  # shape hint only (hidden width)
            return k0, b0, bnp

        if phase == "tail":
            y = _BlockDiagConv(
                num_heads=self.num_heads, out_per_head=self.out_channels,
                kernel_init=kinit, bias_init=final_bias_init,
                dtype=self.dtype, name="conv_out",
            )(x)
            b, h, w, _ = y.shape
            return y.reshape(b, h, w, self.num_heads, self.out_channels)

        first = True
        for k in range(self.num_conv - 1):
            if first:  # tiled-grouped == dense on the shared features
                x = Conv2dTorch(
                    self.num_heads * x.shape[-1], 3, 1, 1,
                    use_bias=self.use_bias, kernel_init=kinit,
                    dtype=self.dtype, name=f"conv_{k}",
                )(x)
                first = False
            else:  # deeper hidden convs (not in shipped configs): grouped
                x = Conv2dTorch(
                    x.shape[-1], 3, 1, 1, use_bias=self.use_bias,
                    groups=self.num_heads, kernel_init=kinit,
                    dtype=self.dtype, name=f"conv_{k}",
                )(x)
            x = BatchNormTorch(dtype=self.dtype, name=f"bn_{k}")(x, train)
            x = nn.relu(x)

        if first:  # num_conv == 1: the final conv consumes the shared x
            y = nn.Conv(
                self.num_heads * self.out_channels, (3, 3),
                padding=((1, 1), (1, 1)), use_bias=True, kernel_init=kinit,
                bias_init=final_bias_init, dtype=self.dtype, name="conv_out",
            )(x)
        else:
            y = _BlockDiagConv(
                num_heads=self.num_heads, out_per_head=self.out_channels,
                kernel_init=kinit, bias_init=final_bias_init,
                dtype=self.dtype, name="conv_out",
            )(x)
        b, h, w, _ = y.shape
        return y.reshape(b, h, w, self.num_heads, self.out_channels)


class CenterHead(nn.Module):
    """Shared conv + stacked subheads. Returns dict of (B,H,W,n_heads,C) preds."""

    spec: HeadSpec
    shared_channels: int = 64
    num_hm_conv: int = 2
    use_bias_before_norm: bool = True
    with_iou: bool = True
    dtype: Any = None

    @nn.compact
    def __call__(self, spatial_features_2d, train: bool) -> Dict[str, jnp.ndarray]:
        x = Conv2dTorch(
            self.shared_channels, 3, 1, 1, use_bias=self.use_bias_before_norm,
            dtype=self.dtype, name="shared_conv",
        )(spatial_features_2d)
        x = BatchNormTorch(dtype=self.dtype, name="shared_bn")(x, train)
        x = nn.relu(x)

        n = self.spec.num_heads
        # no tiling: the subheads' first conv folds the n-way replication
        # into a dense conv on the shared features (see StackedSubHead)

        subs = []
        for name, out_ch in REG_HEADS:
            if name == "iou" and not self.with_iou:
                continue
            subs.append((name, StackedSubHead(
                n, out_ch, 2, self.use_bias_before_norm, dtype=self.dtype,
                name=name)))
        subs.append(("hm", StackedSubHead(
            n, self.spec.max_cls, self.num_hm_conv, self.use_bias_before_norm,
            init_bias=-2.19, dtype=self.dtype, name="hm")))

        import os

        merged = (self.num_hm_conv == 2
                  and os.environ.get("HEAD_MERGED", "1") != "0")
        if not merged:
            return {name: sh(x, train) for name, sh in subs}

        # MERGED hidden: the 7 per-subhead conv_0(64->n·64)+BN+relu stacks
        # concatenate along output channels into ONE conv (64 -> 7·n·64,
        # N=2688 output lanes — top MXU rate vs 7 wall-bound N=384 convs),
        # ONE merged BN (per-channel statistics are identical to the 7
        # separate BNs), one relu — same params, same math, 1/7th the
        # kernel count (the head class was ~16 ms of small-N convs + BN
        # elementwise passes, PERF.md r4). conv_out stays per-subhead
        # (block-diagonal; merging it would 7x its FLOPs).
        pieces = [sh(x, train, phase="pieces") for _, sh in subs]
        dt = self.dtype or x.dtype
        kcat = jnp.concatenate([k for k, _, _ in pieces], axis=-1)
        bcat = jnp.concatenate([b for _, b, _ in pieces], axis=-1)
        h = jax.lax.conv_general_dilated(
            x.astype(dt), kcat.astype(dt), (1, 1), ((1, 1), (1, 1)),
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
        ) + bcat.astype(dt)

        scale = jnp.concatenate([p[2][0] for p in pieces])
        bias = jnp.concatenate([p[2][1] for p in pieces])
        if train:
            # flax nn.BatchNorm semantics (fast variance, f32 stats, torch
            # momentum convention handled by BatchNormTorch = 0.1)
            h32 = h.astype(jnp.float32)
            mean = jnp.mean(h32, axis=(0, 1, 2))
            var = jnp.maximum(
                jnp.mean(h32 * h32, axis=(0, 1, 2)) - mean * mean, 0.0)
            if not self.is_initializing():
                mom = 0.1  # BN_MOM_DEFAULT (head BNs)
                off = 0
                for _, _, (s_, b_, mv, vv) in pieces:
                    c = s_.shape[0]
                    mv.value = (1 - mom) * mv.value + mom * mean[off:off + c]
                    vv.value = (1 - mom) * vv.value + mom * var[off:off + c]
                    off += c
        else:
            mean = jnp.concatenate([p[2][2].value for p in pieces])
            var = jnp.concatenate([p[2][3].value for p in pieces])

        # flax _normalize promotes stats to the compute dtype BEFORE the
        # rsqrt — replicate exactly (a f32 rsqrt here would diverge from the
        # unmerged path at bf16-rsqrt resolution)
        mul = jax.lax.rsqrt(var.astype(dt) + 1e-5) * scale.astype(dt)
        y = nn.relu((h - mean.astype(dt)) * mul + bias.astype(dt))

        preds, off = {}, 0
        for name, sh in subs:
            c = n * self.shared_channels
            preds[name] = sh(y[..., off:off + c], train, phase="tail")
            off += c
        return preds


# ---------------------------------------------------------------------------
# Target assignment (vectorized gaussian stamping)
# ---------------------------------------------------------------------------


def _stamp_heatmap(centers_int, radii, local_cls, valid, hw, max_cls, chunk=50):
    """Max-compose per-box gaussians into (max_cls, H, W).

    centers_int: (M, 2) int [x, y]; radii: (M,) int; local_cls: (M,) in
    [0, max_cls); valid: (M,) bool. Gaussian value at pixel p:
    exp(-(|p - c|²)/(2σ²)), σ=(2r+1)/6, support |Δ|<=r (chebyshev), centered
    at the INTEGER center (centernet_utils.py:38-69 semantics).
    """
    H, W = hw
    M = centers_int.shape[0]
    pad = (-M) % chunk
    if pad:
        centers_int = jnp.pad(centers_int, ((0, pad), (0, 0)))
        radii = jnp.pad(radii, (0, pad))
        local_cls = jnp.pad(local_cls, (0, pad))
        valid = jnp.pad(valid, (0, pad))
    n_chunks = (M + pad) // chunk

    ys = jnp.arange(H)[:, None]
    xs = jnp.arange(W)[None, :]

    def body(hm, sl):
        c, r, lc, v = sl
        # the gaussian is separable: exp(-(dx²+dy²)/2σ²) = exp(-dx²/2σ²) ·
        # exp(-dy²/2σ²), so the transcendental work is 2·(chunk, max(H,W))
        # vectors instead of (chunk, H, W) maps (r3 profile: the fused exp
        # body was 4.7 ms/step); the (chunk, H, W) outer product is one
        # multiply that fuses into the max-compose
        dx = xs - c[:, 0, None]  # (chunk, W)
        dy = ys.T - c[:, 1, None]  # (chunk, H)
        inv2s = 1.0 / (2 * jnp.square((2 * r.astype(jnp.float32) + 1) / 6.0))
        gx = jnp.exp(-(dx * dx) * inv2s[:, None])
        gy = jnp.exp(-(dy * dy) * inv2s[:, None])
        gx = jnp.where((jnp.abs(dx) <= r[:, None]), gx, 0.0)
        gy = jnp.where((jnp.abs(dy) <= r[:, None]) & v[:, None], gy, 0.0)
        # fold the class one-hot into the SMALL gy vector, then max-reduce
        # the (chunk, C, H, W) product in one pass: the explicit
        # g = gy⊗gx intermediate had TWO consumers and XLA materialized it
        # — (chunk, H, W) f32 per scan iter ≈ 900 MB/step of loop-fusion
        # traffic across B·heads·chunks (r5 profile: vmap(vmap())/while
        # 5.3 ms @320 GB/s + 4.7 ms at the product). With gyc as the only
        # large-product producer feeding ONE reduce, the product fuses
        # into the max and never hits HBM. Same math: g·onehot = gy·onehot·gx.
        onehot = jax.nn.one_hot(lc, max_cls, dtype=gy.dtype)  # (chunk, C)
        gyc = gy[:, None, :] * onehot[:, :, None]  # (chunk, C, H) — small
        contrib = jnp.max(gyc[..., None] * gx[:, None, None, :], axis=0)
        return jnp.maximum(hm, contrib), None

    slices = (
        centers_int.reshape(n_chunks, chunk, 2),
        radii.reshape(n_chunks, chunk),
        local_cls.reshape(n_chunks, chunk),
        valid.reshape(n_chunks, chunk),
    )
    hm0 = jnp.zeros((max_cls, H, W), jnp.float32)
    hm, _ = jax.lax.scan(body, hm0, slices)
    return hm


def assign_targets(
    gt_boxes: jnp.ndarray,
    spec: HeadSpec,
    feature_map_hw: Tuple[int, int],
    feature_map_stride: int,
    voxel_size,
    point_cloud_range,
    num_max_objs: int = 500,
    gaussian_overlap: float = 0.1,
    min_radius: int = 2,
):
    """Vectorized CenterHead target assignment (center_head.py:111-235).

    gt_boxes: (B, M, D) pcdet layout [x,y,z,dx,dy,dz,heading,(vx,vy),cls],
    cls global 1-based, 0-padded rows. Returns a dict of stacked targets:
      heatmaps   (B, n_heads, H, W, max_cls)
      target_boxes (B, n_heads, M, D)   # [Δx, Δy, z, log dims, cos, sin, extras]
      inds, masks (B, n_heads, M)
      gt_box7    (B, n_heads, M, 7)
    Box slots keep their original positions (reference compacts per head;
    all downstream reductions are slot-permutation-invariant).
    """
    H, W = feature_map_hw
    vx, vy = float(voxel_size[0]), float(voxel_size[1])
    x0, y0 = float(point_cloud_range[0]), float(point_cloud_range[1])
    D = gt_boxes.shape[-1]

    ids_table = jnp.asarray(spec.class_ids)        # (n_heads, max_cls)
    valid_table = jnp.asarray(spec.class_valid)    # (n_heads, max_cls)

    def per_sample(boxes):
        cls = boxes[:, -1].astype(jnp.int32)
        coord_x = jnp.clip((boxes[:, 0] - x0) / vx / feature_map_stride, 0, W - 0.5)
        coord_y = jnp.clip((boxes[:, 1] - y0) / vy / feature_map_stride, 0, H - 0.5)
        cint_x = coord_x.astype(jnp.int32)
        cint_y = coord_y.astype(jnp.int32)
        dxf = boxes[:, 3] / vx / feature_map_stride
        dyf = boxes[:, 4] / vy / feature_map_stride
        radius = geometry.gaussian_radius(dxf, dyf, gaussian_overlap)
        radius = jnp.maximum(radius.astype(jnp.int32), min_radius)
        ok_size = (dxf > 0) & (dyf > 0) & (cls > 0)

        # regression targets (slot-aligned, head-independent)
        ret = jnp.zeros((boxes.shape[0], D), boxes.dtype)
        ret = ret.at[:, 0].set(coord_x - cint_x)
        ret = ret.at[:, 1].set(coord_y - cint_y)
        ret = ret.at[:, 2].set(boxes[:, 2])
        ret = ret.at[:, 3:6].set(jnp.log(jnp.clip(boxes[:, 3:6], 1e-6)))
        ret = ret.at[:, 6].set(jnp.cos(boxes[:, 6]))
        ret = ret.at[:, 7].set(jnp.sin(boxes[:, 6]))
        if D > 8:
            ret = ret.at[:, 8:].set(boxes[:, 7:-1])
        inds = cint_y * W + cint_x

        def per_head(ids, vmask):
            match = cls[:, None] == ids[None, :]  # (M, max_cls)
            in_head = jnp.any(match & vmask[None], axis=1)
            local = jnp.argmax(match, axis=1)
            sel = in_head & ok_size
            hm = _stamp_heatmap(
                jnp.stack([cint_x, cint_y], -1), radius, local, sel, (H, W), spec.max_cls
            )
            m = sel.astype(jnp.int32)
            return (
                jnp.transpose(hm, (1, 2, 0)),  # (H, W, max_cls)
                ret * m[:, None],
                inds * m,
                m,
                boxes[:, :7] * m[:, None].astype(boxes.dtype),
            )

        return jax.vmap(per_head)(ids_table, valid_table)

    heat, tb, inds, masks, gt7 = jax.vmap(per_sample)(gt_boxes)
    return {
        "heatmaps": heat,       # (B, n_heads, H, W, max_cls)
        "target_boxes": tb,     # (B, n_heads, M, D)
        "inds": inds,           # (B, n_heads, M)
        "masks": masks,         # (B, n_heads, M)
        "gt_box7": gt7,         # (B, n_heads, M, 7)
    }


def flatten_class_channels(spec: HeadSpec, stacked_hwHC: jnp.ndarray) -> jnp.ndarray:
    """(B, H, W, n_heads, max_cls) -> (B, H, W, total_classes), dropping the
    padded class slots. Channel order = global class order (heads enumerate
    CLASS_NAMES in order). Used to build the concatenated heatmap tensors the
    PFD loss consumes (radar_distill_final.py:114-120)."""
    chans = []
    for h in range(spec.num_heads):
        for j in range(len(spec.heads[h])):
            chans.append(stacked_hwHC[..., h, j])
    return jnp.stack(chans, axis=-1)


def flatten_target_heatmaps(spec: HeadSpec, heatmaps_BnHWC: jnp.ndarray) -> jnp.ndarray:
    """(B, n_heads, H, W, max_cls) -> (B, H, W, total_classes)."""
    chans = []
    for h in range(spec.num_heads):
        for j in range(len(spec.heads[h])):
            chans.append(heatmaps_BnHWC[:, h, :, :, j])
    return jnp.stack(chans, axis=-1)


# ---------------------------------------------------------------------------
# Losses (center_head.py:241-311, loss_utils.py:266-311, 347-376, 651-703)
# ---------------------------------------------------------------------------


def focal_loss_cornernet(pred, gt):
    """CornerNet focal loss; pred already clip-sigmoided (loss_utils.py:266-301)."""
    pos = (gt == 1.0).astype(jnp.float32)
    neg = (gt < 1.0).astype(jnp.float32)
    neg_w = jnp.power(1 - gt, 4)
    pos_loss = jnp.log(pred) * jnp.power(1 - pred, 2) * pos
    neg_loss = jnp.log(1 - pred) * jnp.power(pred, 2) * neg_w * neg
    num_pos = jnp.sum(pos)
    pos_l = jnp.sum(pos_loss)
    neg_l = jnp.sum(neg_loss)
    return jnp.where(num_pos == 0, -neg_l, -(pos_l + neg_l) / jnp.clip(num_pos, 1.0))


def gather_at_inds(feat_hw_c, inds):
    """(H*W, C) gather at (M,) flat spatial inds (loss_utils._transpose_and_gather_feat)."""
    return feat_hw_c[inds]


def reg_l1_loss(pred, target, mask):
    """Per-code-dim L1 over masked object slots (loss_utils.py:347-376).

    pred/target: (B, M, D); mask: (B, M). Returns (D,) per-dim losses
    normalized by clamp(num_pos, 1)."""
    num = jnp.sum(mask.astype(jnp.float32))
    m = mask.astype(jnp.float32)[..., None]
    diff = jnp.abs(pred * m - target * m)
    return jnp.sum(diff, axis=(0, 1)) / jnp.clip(num, 1.0)


def decode_boxes_full_map(preds_h, hw, feature_map_stride, voxel_size, point_cloud_range):
    """Decode a (H,W)-dense box map for one head's predictions
    (center_head.py:268-295). preds_h: dict of (B,H,W,C) slices for one head.
    Returns (B, H*W, 7) [x,y,z,dx,dy,dz,rot]."""
    H, W = hw
    dim = jnp.exp(jnp.clip(preds_h["dim"].astype(jnp.float32), -5, 5))
    rot = jnp.arctan2(preds_h["rot"][..., 1:2].astype(jnp.float32),
                      preds_h["rot"][..., 0:1].astype(jnp.float32))
    ys = jnp.arange(H, dtype=jnp.float32)[:, None]
    xs = jnp.arange(W, dtype=jnp.float32)[None, :]
    cx = xs[None, ..., None] + preds_h["center"][..., 0:1].astype(jnp.float32)
    cy = ys[None, ..., None] + preds_h["center"][..., 1:2].astype(jnp.float32)
    # note: reference casts pc_range to int here (center_head.py:292-293)
    cx = cx * feature_map_stride * float(voxel_size[0]) + int(point_cloud_range[0])
    cy = cy * feature_map_stride * float(voxel_size[1]) + int(point_cloud_range[1])
    boxes = jnp.concatenate(
        [cx, cy, preds_h["center_z"].astype(jnp.float32), dim, rot], axis=-1
    )
    b = boxes.shape[0]
    return boxes.reshape(b, H * W, 7)


def centerhead_loss(
    preds: Dict[str, jnp.ndarray],
    targets: Dict[str, jnp.ndarray],
    spec: HeadSpec,
    code_weights: Sequence[float],
    cls_weight: float,
    loc_weight: float,
    hw: Tuple[int, int],
    feature_map_stride: int,
    voxel_size,
    point_cloud_range,
    with_iou: bool = True,
    iou_reg: bool = True,
):
    """Full CenterHead loss (center_head.py:241-311), summed over task heads.

    The reference's per-head python loop is a single vmap over the stacked
    head axis here (one-sixth the HLO; one fused kernel set)."""
    H, W = hw
    cw = jnp.asarray(code_weights, jnp.float32)
    cls_valid = jnp.asarray(spec.class_valid)  # (n_heads, max_cls)

    # stack preds head-first: (n_heads, B, H, W, C)
    def hfirst(key):
        return jnp.moveaxis(preds[key].astype(jnp.float32), 3, 0)

    hm_p = hfirst("hm")
    reg_map = jnp.concatenate(
        [hfirst(k) for k in ("center", "center_z", "dim", "rot", "vel")], axis=-1
    )  # (n_heads, B, H, W, 10)
    iou_p = hfirst("iou") if with_iou else None
    box_parts = {k: hfirst(k) for k in ("center", "center_z", "dim", "rot")}

    t_hm = jnp.moveaxis(targets["heatmaps"], 1, 0)       # (n_heads, B, H, W, maxC)
    t_boxes = jnp.moveaxis(targets["target_boxes"], 1, 0)
    t_inds = jnp.moveaxis(targets["inds"], 1, 0)
    t_masks = jnp.moveaxis(targets["masks"], 1, 0)
    t_gt7 = jnp.moveaxis(targets["gt_box7"], 1, 0)

    def one_head(hm_p, reg_map, iou_p, bp, t_hm, t_boxes, t_inds, t_masks, t_gt7, vmask):
        hm_pred = clip_sigmoid(hm_p)
        # padded class channels contribute ~0 (pred=eps, target=0)
        hm_pred = jnp.where(vmask[None, None, None, :], hm_pred, 1e-4)
        hm_tgt = jnp.where(vmask[None, None, None, :], t_hm, 0.0)
        hm_loss = focal_loss_cornernet(hm_pred, hm_tgt) * cls_weight

        b = reg_map.shape[0]
        reg_flat = reg_map.reshape(b, H * W, -1)
        pred_at = jax.vmap(gather_at_inds)(reg_flat, t_inds)  # (B, M, 10)
        reg_loss = reg_l1_loss(pred_at, t_boxes[..., : reg_map.shape[-1]], t_masks)
        loc_loss = jnp.sum(reg_loss * cw) * loc_weight

        iou_loss = jnp.float32(0.0)
        iou_reg_loss = jnp.float32(0.0)
        if with_iou or iou_reg:
            box_map = decode_boxes_full_map(
                bp, hw, feature_map_stride, voxel_size, point_cloud_range
            )  # (B, HW, 7)
            box_at = jax.vmap(gather_at_inds)(box_map, t_inds)  # (B, M, 7)
            mask = t_masks.astype(jnp.float32)
            nmask = jnp.sum(mask)
            if with_iou:
                iou_pred_at = jax.vmap(gather_at_inds)(
                    iou_p.reshape(b, H * W, 1), t_inds
                )[..., 0]
                # IouLoss (loss_utils.py:651-676): target = 2*IoU3D-1, stop-grad boxes
                iou_tgt = geometry.boxes_aligned_iou3d(
                    jax.lax.stop_gradient(box_at.reshape(-1, 7)), t_gt7.reshape(-1, 7)
                ).reshape(b, -1)
                iou_tgt = 2.0 * iou_tgt - 1.0
                iou_loss = jnp.sum(jnp.abs(iou_pred_at - iou_tgt) * mask) / (nmask + 1e-4)
                iou_loss = jnp.where(nmask == 0, 0.0, iou_loss)
            if iou_reg:
                # IouRegLoss DIoU (loss_utils.py:677-703)
                diou = geometry.bbox3d_overlaps_diou(
                    box_at.reshape(-1, 7), t_gt7.reshape(-1, 7)
                ).reshape(b, -1)
                iou_reg_loss = jnp.sum((1.0 - diou) * mask) / (nmask + 1e-4)
                iou_reg_loss = jnp.where(nmask == 0, 0.0, iou_reg_loss)
        return hm_loss, loc_loss, iou_loss, iou_reg_loss

    hm_l, loc_l, iou_l, ioureg_l = jax.vmap(one_head)(
        hm_p, reg_map,
        iou_p if iou_p is not None else jnp.zeros_like(hm_p[..., :1]),
        box_parts, t_hm, t_boxes, t_inds, t_masks, t_gt7, cls_valid,
    )
    total = jnp.sum(hm_l + loc_l) + jnp.sum(iou_l) + loc_weight * jnp.sum(ioureg_l)
    tb = {"rpn_loss": total}
    for h in range(spec.num_heads):
        tb[f"hm_loss_head_{h}"] = hm_l[h]
        tb[f"loc_loss_head_{h}"] = loc_l[h]
        if with_iou:
            tb[f"iou_loss_head_{h}"] = iou_l[h]
        if iou_reg:
            tb[f"iou_reg_loss_head_{h}"] = ioureg_l[h]
    return total, tb


# ---------------------------------------------------------------------------
# Decode + NMS (center_head.py:313-370, centernet_utils.py:243-309)
# ---------------------------------------------------------------------------


def decode_and_nms(
    preds: Dict[str, jnp.ndarray],
    spec: HeadSpec,
    hw: Tuple[int, int],
    feature_map_stride: int,
    voxel_size,
    point_cloud_range,
    post_center_limit_range,
    k_per_head: int = 500,
    score_thresh: float = 0.1,
    rectifier: float = 0.5,
    nms_thresh: float = 0.2,
    nms_pre: int = 1000,
    nms_post: int = 83,
    with_iou: bool = True,
    with_vel: bool = True,
):
    """Batched decode + per-head class-agnostic NMS with fixed-shape outputs.

    Returns dict with 'boxes' (B, n_heads*post, 9), 'scores', 'labels'
    (1-based global), 'valid'. Box layout [x,y,z,dx,dy,dz,rot,vx,vy].
    """
    H, W = hw
    n_heads = spec.num_heads
    B = preds["hm"].shape[0]
    pclr = jnp.asarray(post_center_limit_range, jnp.float32)
    box_dim = 9 if with_vel else 7

    all_boxes, all_scores, all_labels, all_valid = [], [], [], []
    for h in range(n_heads):
        hm = jax.nn.sigmoid(preds["hm"][..., h, :].astype(jnp.float32))  # (B,H,W,maxC)
        hm = jnp.where(jnp.asarray(spec.class_valid[h])[None, None, None, :], hm, -1.0)
        # global top-k over (class, y, x) — equivalent to the reference's
        # two-stage _topk (centernet_utils.py:155-170)
        hm_flat = jnp.transpose(hm, (0, 3, 1, 2)).reshape(B, -1)  # (B, C*H*W)
        scores, inds = jax.lax.top_k(hm_flat, k_per_head)
        cls_local = inds // (H * W)
        spatial = inds % (H * W)
        ys = (spatial // W).astype(jnp.float32)
        xs = (spatial % W).astype(jnp.float32)

        def g(key, ch):
            flat = preds[key][..., h, :].astype(jnp.float32).reshape(B, H * W, ch)
            return jax.vmap(gather_at_inds)(flat, spatial)

        center = g("center", 2)
        center_z = g("center_z", 1)
        dim = jnp.exp(g("dim", 3))
        rot = g("rot", 2)
        angle = jnp.arctan2(rot[..., 1:2], rot[..., 0:1])
        x_w = (xs[..., None] + center[..., 0:1]) * feature_map_stride * float(voxel_size[0]) + float(point_cloud_range[0])
        y_w = (ys[..., None] + center[..., 1:2]) * feature_map_stride * float(voxel_size[1]) + float(point_cloud_range[1])
        parts = [x_w, y_w, center_z, dim, angle]
        if with_vel:
            parts.append(g("vel", 2))
        boxes = jnp.concatenate(parts, axis=-1)  # (B, K, box_dim)

        valid = jnp.all(boxes[..., :3] >= pclr[:3], -1) & jnp.all(boxes[..., :3] <= pclr[3:], -1)
        if score_thresh is not None:
            valid &= scores > score_thresh

        if with_iou:
            iou_p = jnp.clip(g("iou", 1)[..., 0], 0.0, 1.0)
            scores = jnp.power(scores, 1 - rectifier) * jnp.power(iou_p, rectifier)

        sel, sel_valid = jax.vmap(
            partial(nms.class_agnostic_nms, nms_thresh=nms_thresh,
                    pre_max=min(nms_pre, k_per_head), post_max=nms_post)
        )(boxes, scores, valid)

        take = jax.vmap(lambda a, i: a[i])
        all_boxes.append(take(boxes, sel))
        all_scores.append(take(scores, sel))
        # head-local class slot -> global 1-based label (class_id_mapping,
        # center_head.py:64-69 + :349, then +1 at :368)
        glob1 = jnp.asarray(spec.class_ids[h], jnp.int32)  # already 1-based
        all_labels.append(take(glob1[cls_local], sel))
        all_valid.append(sel_valid)

    return {
        "boxes": jnp.concatenate(all_boxes, axis=1),
        "scores": jnp.concatenate(all_scores, axis=1),
        "labels": jnp.concatenate(all_labels, axis=1),
        "valid": jnp.concatenate(all_valid, axis=1),
    }
