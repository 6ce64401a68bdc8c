"""Instantiate the REFERENCE pcdet module classes (from /root/reference) to
obtain the ground-truth checkpoint state_dict key names and tensor shapes.

This exists so the converter test is NOT circular: the keys/shapes come from
executing the reference nn.Module __init__ definitions themselves
(spconv_backbone_2d.py, radar_distill_final.py, center_head.py, ...), driven
by the reference's own shipped YAML (tools/cfgs/radar_distill/
radar_distill_train.yaml) — not from the converter's mapping tables.

Only __init__ runs (parameter registration); no forward. CUDA/compiled deps
that the reference imports at module scope are stubbed with minimal
standins (spconv convs register a (O, kH, kW, I) weight exactly like
spconv 2.x SparseConvolution; everything else is an empty placeholder).
"""

from __future__ import annotations

import sys
import types
from pathlib import Path

import numpy as np

REFERENCE = Path("/root/reference")


def _stub_module(name, **attrs):
    m = sys.modules.get(name)
    if m is None:
        m = types.ModuleType(name)
        sys.modules[name] = m
    for k, v in attrs.items():
        setattr(m, k, v)
    return m


def _install_stubs():
    import torch
    import torch.nn as nn
    import torch.nn.functional as F

    class SparseConvTensor:
        """Dense-backed spconv 2.x SparseConvTensor: features (N, C) rows +
        indices (N, 3) [b, y, x]. `.dense()` returns NCHW like spconv."""

        def __init__(self, features, indices, spatial_shape, batch_size):
            self.features = features
            self.indices = indices
            self.spatial_shape = [int(s) for s in spatial_shape]
            self.batch_size = int(batch_size)

        def dense(self):
            h, w = self.spatial_shape
            c = self.features.shape[1]
            out = self.features.new_zeros(self.batch_size, h, w, c)
            idx = self.indices.long()
            out = out.index_put((idx[:, 0], idx[:, 1], idx[:, 2]), self.features)
            return out.permute(0, 3, 1, 2).contiguous()

        def replace_feature(self, f):
            return SparseConvTensor(
                f, self.indices, self.spatial_shape, self.batch_size)

    class _SparseConvBase(nn.Module):
        """Registers weight/bias with spconv 2.x shapes: (O, kH, kW, I), and
        COMPUTES real sparse-conv forwards on the dense-backed tensor:
        submanifold = centered dense conv gathered at the input sites;
        strided sparse conv = strided dense conv with the output-site rule
        'any active input in the receptive field' (max_pool of occupancy) —
        spconv's arithmetic exactly (inactive sites contribute zeros)."""

        def __init__(self, in_channels, out_channels, kernel_size, stride=1,
                     padding=0, dilation=1, groups=1, bias=True,
                     indice_key=None, **kw):
            super().__init__()
            k = (kernel_size, kernel_size) if isinstance(kernel_size, int) else tuple(kernel_size)
            self.kernel_size = k
            self.stride = stride if isinstance(stride, tuple) else (stride, stride)
            self.padding = padding if isinstance(padding, tuple) else (padding, padding)
            # real spconv 2.x reset_parameters: kaiming_uniform(a=sqrt(5))
            # on the (O, kH, kW, I) weight + torch-Conv-style bias bound
            # (a zero init here would zero every strided block's output and
            # make the radar-branch oracle degenerate)
            import math

            self.weight = nn.Parameter(
                torch.empty(out_channels, *k, in_channels))
            nn.init.kaiming_uniform_(self.weight, a=math.sqrt(5))
            if bias:
                fan_in = in_channels * k[0] * k[1]
                bound = 1.0 / math.sqrt(fan_in)
                self.bias = nn.Parameter(
                    torch.empty(out_channels).uniform_(-bound, bound))
            else:
                self.bias = None

        def _w_oihw(self):
            return self.weight.permute(0, 3, 1, 2)

    class SubMConv2d(_SparseConvBase):
        def forward(self, x):
            d = x.dense()
            pad = (self.kernel_size[0] // 2, self.kernel_size[1] // 2)
            y = F.conv2d(d, self._w_oihw(), self.bias, stride=1, padding=pad)
            idx = x.indices.long()
            feats = y[idx[:, 0], :, idx[:, 1], idx[:, 2]]
            return x.replace_feature(feats)

    class SparseConv2d(_SparseConvBase):
        def forward(self, x):
            d = x.dense()
            y = F.conv2d(d, self._w_oihw(), self.bias, stride=self.stride,
                         padding=self.padding)
            idx = x.indices.long()
            occ = d.new_zeros(d.shape[0], 1, d.shape[2], d.shape[3])
            occ[idx[:, 0], 0, idx[:, 1], idx[:, 2]] = 1.0
            om = F.max_pool2d(occ, self.kernel_size, self.stride, self.padding)
            new_idx = (om[:, 0] > 0).nonzero().int()
            ni = new_idx.long()
            feats = y[ni[:, 0], :, ni[:, 1], ni[:, 2]]
            return SparseConvTensor(
                feats, new_idx, list(y.shape[2:]), x.batch_size)

    class SparseInverseConv2d(_SparseConvBase):
        pass

    class SparseSequential(nn.Sequential):
        """Like spconv's: pointwise dense modules (BN1d/ReLU/...) apply to
        .features; sparse convs and sparse containers get the tensor."""

        _FEATURE_OPS = (nn.BatchNorm1d, nn.ReLU, nn.LeakyReLU, nn.GELU,
                        nn.Sigmoid, nn.Identity, nn.Linear)

        def forward(self, x):
            for m in self:
                if isinstance(x, SparseConvTensor) and isinstance(
                        m, self._FEATURE_OPS):
                    x = x.replace_feature(m(x.features))
                else:
                    x = m(x)
            return x

    spconv = _stub_module(
        "spconv",
        __version__="2.3.6",
        constants=types.SimpleNamespace(SPCONV_USE_DIRECT_TABLE=True),
        SubMConv2d=SubMConv2d,
        SparseConv2d=SparseConv2d,
        SparseInverseConv2d=SparseInverseConv2d,
        SparseSequential=SparseSequential,
        SparseModule=nn.Module,
        SparseConvTensor=SparseConvTensor,
        conv=types.SimpleNamespace(SparseConvolution=_SparseConvBase),
    )
    sys.modules["spconv.pytorch"] = spconv
    spconv.pytorch = spconv

    _stub_module("openpyxl")
    _stub_module("SharedArray")

    # real torch_scatter semantics (scatter_max returns (values, argmax);
    # the reference only consumes [0] / scatter_mean, dynamic_pillar_vfe.py:40,105)
    def _expand_index(src, index):
        return index.view(-1, *([1] * (src.dim() - 1))).expand_as(src)

    def _scatter_max(src, index, dim=0, dim_size=None):
        assert dim == 0
        n = dim_size or int(index.max().item()) + 1
        out = src.new_zeros((n,) + src.shape[1:]).scatter_reduce(
            0, _expand_index(src, index), src, reduce="amax", include_self=False
        )
        return out, None

    def _scatter_mean(src, index, dim=0, dim_size=None):
        assert dim == 0
        n = dim_size or int(index.max().item()) + 1
        return src.new_zeros((n,) + src.shape[1:]).scatter_reduce(
            0, _expand_index(src, index), src, reduce="mean", include_self=False
        )

    _stub_module("torch_scatter", scatter_max=_scatter_max,
                 scatter_mean=_scatter_mean)

    def _jit(*args, **kwargs):
        if len(args) == 1 and callable(args[0]) and not kwargs:
            return args[0]
        return lambda f: f

    _stub_module("numba", jit=_jit, njit=_jit, prange=range)

    def _mdcn_torch(inp, offset, mask, weight, bias, stride, padding,
                    dilation=(1, 1), groups=1, deformable_groups=1,
                    im2col_step=64):
        """Real modulated deformable conv (CUDA-kernel semantics,
        modulated_deform_im2col_cuda.cuh): offset channel 2k = Δy of tap k,
        2k+1 = Δx; bilinear sampling with zeros outside; modulation applied
        to the sampled value; plain autograd provides the backward."""
        sh, sw = stride
        ph, pw = padding
        dh_, dw_ = dilation if isinstance(dilation, (tuple, list)) else (dilation, dilation)
        B, Cin, H, W = inp.shape
        O, _, kh, kw = weight.shape
        K = kh * kw
        Ho = (H + 2 * ph - (dh_ * (kh - 1) + 1)) // sh + 1
        Wo = (W + 2 * pw - (dw_ * (kw - 1) + 1)) // sw + 1
        dt = inp.dtype
        ho = torch.arange(Ho, dtype=dt)
        wov = torch.arange(Wo, dtype=dt)
        kiv = torch.arange(kh, dtype=dt)
        kjv = torch.arange(kw, dtype=dt)
        base_h = (ho * sh - ph)[:, None, None, None] + (kiv * dh_)[None, None, :, None]
        base_w = (wov * sw - pw)[None, :, None, None] + (kjv * dw_)[None, None, None, :]
        base_h = base_h.expand(Ho, Wo, kh, kw).reshape(Ho, Wo, K)
        base_w = base_w.expand(Ho, Wo, kh, kw).reshape(Ho, Wo, K)
        off = offset.view(B, K, 2, Ho, Wo)
        hs = base_h[None] + off[:, :, 0].permute(0, 2, 3, 1)  # (B,Ho,Wo,K)
        ws = base_w[None] + off[:, :, 1].permute(0, 2, 3, 1)
        xf = inp.permute(0, 2, 3, 1).reshape(B, H * W, Cin)

        def gather(hi, wi):
            ok = (hi >= 0) & (hi < H) & (wi >= 0) & (wi < W)
            idx = (hi.clamp(0, H - 1) * W + wi.clamp(0, W - 1)).long()
            v = torch.gather(
                xf, 1, idx.reshape(B, -1, 1).expand(-1, -1, Cin))
            return v.reshape(B, Ho, Wo, K, Cin) * ok[..., None].to(dt)

        h0 = hs.floor()
        w0 = ws.floor()
        fh = hs - h0
        fw = ws - w0
        val = None
        for a in (0, 1):
            for b in (0, 1):
                wt = (fh if a else 1 - fh) * (fw if b else 1 - fw)
                term = gather(h0 + a, w0 + b) * wt[..., None]
                val = term if val is None else val + term
        val = val * mask.view(B, K, Ho, Wo).permute(0, 2, 3, 1)[..., None]
        w2 = weight.permute(2, 3, 1, 0).reshape(K * Cin, O)
        y = val.reshape(B, Ho * Wo, K * Cin) @ w2
        y = y.reshape(B, Ho, Wo, O).permute(0, 3, 1, 2).contiguous()
        if bias is not None:
            y = y + bias.view(1, -1, 1, 1)
        return y

    # the DCN autograd wrappers (top-level `functions` package in reference);
    # ModulatedDeformConvFunction gets the real CPU implementation above
    fns = _stub_module("functions")
    for sub, cls_names in (
        ("deform_conv_func", ["DeformConvFunction"]),
        ("modulated_deform_conv_func", ["ModulatedDeformConvFunction"]),
        ("deform_psroi_pooling_func", ["DeformRoIPoolingFunction"]),
    ):
        m = _stub_module(
            f"functions.{sub}",
            **{c: type(c, (), {
                "apply": staticmethod(
                    _mdcn_torch if c == "ModulatedDeformConvFunction"
                    else (lambda *a, **k: None))})
               for c in cls_names},
        )
        setattr(fns, sub, m)

    # compiled CUDA extension modules imported by the op wrappers
    for name in (
        "pcdet.ops.iou3d_nms.iou3d_nms_cuda",
        "pcdet.ops.roiaware_pool3d.roiaware_pool3d_cuda",
        "pcdet.ops.roipoint_pool3d.roipoint_pool3d_cuda",
        "pcdet.ops.pointnet2.pointnet2_batch.pointnet2_batch_cuda",
        "pcdet.ops.pointnet2.pointnet2_stack.pointnet2_stack_cuda",
        "pcdet.ops.bev_pool.bev_pool_ext",
        "pcdet.ops.ingroup_inds.ingroup_inds_cuda",
    ):
        _stub_module(name)
    # generated at install time in the reference; absent from the checkout
    _stub_module("pcdet.version", __version__="0.6.0+ref")
    # modules referenced by package __init__s but MISSING from the reference
    # checkout itself (dead imports in the upstream repo)
    _stub_module(
        "pcdet.models.backbones_2d.radar_distill_cl", Radar_Distill_CL=object
    )


def _package_shell(name, path):
    """Register a package module WITHOUT executing its __init__.py, so that
    importing one target file doesn't drag in the reference's entire model
    zoo (whose __init__s import torchvision/kornia-class dependencies)."""
    if name in sys.modules:
        return sys.modules[name]
    m = types.ModuleType(name)
    m.__path__ = [str(path)]
    sys.modules[name] = m
    parent, _, leaf = name.rpartition(".")
    if parent and parent in sys.modules:
        setattr(sys.modules[parent], leaf, m)
    return m


def load_reference_model_cfg():
    """The reference's shipped distill config (MODEL + CLASS_NAMES)."""
    import yaml

    from radardistill_tpu.config import ConfigDict

    path = REFERENCE / "tools/cfgs/radar_distill/radar_distill_train.yaml"
    with open(path) as f:
        raw = yaml.safe_load(f)
    return ConfigDict(raw)


def build_reference_modules(grid=(1440, 1440, 1), keep_cuda_patch=False):
    """Instantiate every module of the reference RadarDistill detector
    topology (detector3d_template.py module scope names) under compute-
    capable stubs. Returns (modules dict, cfg). With keep_cuda_patch the
    .cuda() neutralization stays installed (needed to FORWARD the modules
    on CPU — assign_targets calls .cuda(), center_head.py:228)."""
    assert REFERENCE.exists(), "reference checkout not present"
    _install_stubs()
    if str(REFERENCE) not in sys.path:
        sys.path.insert(0, str(REFERENCE))

    import torch

    # shell the heavyweight package __init__s (they import the whole model
    # zoo incl. torchvision-dependent files); the target modules' own
    # relative imports still resolve through __path__
    import pcdet  # real top-level init (light)

    models_dir = REFERENCE / "pcdet" / "models"
    _package_shell("pcdet.models", models_dir)
    _package_shell("pcdet.models.backbones_2d", models_dir / "backbones_2d")
    _package_shell("pcdet.models.backbones_3d", models_dir / "backbones_3d")
    _package_shell("pcdet.models.backbones_3d.vfe", models_dir / "backbones_3d" / "vfe")
    _package_shell("pcdet.models.dense_heads", models_dir / "dense_heads")

    from pcdet.models.backbones_2d.base_bev_backbone import BaseBEVBackboneV2
    from pcdet.models.backbones_2d.radar_distill_final import Radar_Distill
    from pcdet.models.backbones_3d.spconv_backbone_2d import PillarRes18BackBone8x
    from pcdet.models.backbones_3d.spconv_backbone_2d_distillation import (
        Radar_PillarRes18BackBone8x,
    )
    from pcdet.models.backbones_3d.vfe.dynamic_pillar_vfe import (
        DynamicPillarVFESimple2D,
        Radar_DynamicPillarVFESimple2D,
    )
    from pcdet.models.dense_heads.center_head import CenterHead
    from pcdet.models.dense_heads.radar_center_head import Radar_CenterHead

    # reference __init__s call .cuda() on buffers; neutralize on CPU-only
    # torch for the duration of construction
    orig_tensor_cuda = torch.Tensor.cuda
    orig_module_cuda = torch.nn.Module.cuda
    torch.Tensor.cuda = lambda self, *a, **k: self
    torch.nn.Module.cuda = lambda self, *a, **k: self

    cfg = load_reference_model_cfg()
    model_cfg = cfg.MODEL
    class_names = list(cfg.CLASS_NAMES)
    grid_size = np.asarray(grid)
    extent = grid[0] * 0.075 / 2  # same derivation as utils/testing.make_model_cfg
    pcr = np.asarray([-extent, -extent, -5.0, extent, extent, 3.0], np.float32)
    voxel_size = np.asarray([0.075, 0.075, 8.0], np.float32)

    # num point features as the reference data layer provides them:
    # lidar (x,y,z,intensity,timestamp)=5, radar (x,y,z,rcs,vx,vy)=6
    def _build_modules():
        return {
        "vfe": DynamicPillarVFESimple2D(
            model_cfg=model_cfg.VFE, num_point_features=5,
            voxel_size=voxel_size, grid_size=grid_size, point_cloud_range=pcr,
        ),
        "radar_vfe": Radar_DynamicPillarVFESimple2D(
            model_cfg=model_cfg.RADAR_VFE, num_point_features=6,
            voxel_size=voxel_size, grid_size=grid_size, point_cloud_range=pcr,
        ),
        "backbone_3d": PillarRes18BackBone8x(
            model_cfg=model_cfg.BACKBONE_3D, input_channels=32, grid_size=grid_size,
        ),
        "radar_backbone_3d": Radar_PillarRes18BackBone8x(
            model_cfg=model_cfg.RADAR_BACKBONE_3D, input_channels=32, grid_size=grid_size,
        ),
        "backbone_2d": BaseBEVBackboneV2(model_cfg=model_cfg.BACKBONE_2D),
        "radar_backbone_2d": Radar_Distill(model_cfg=model_cfg.RADAR_BACKBONE_2D),
        "dense_head": CenterHead(
            model_cfg=model_cfg.DENSE_HEAD, input_channels=256,
            num_class=len(class_names), class_names=class_names,
            grid_size=grid_size, point_cloud_range=pcr, voxel_size=voxel_size,
            predict_boxes_when_training=False,
        ),
        "radar_dense_head": Radar_CenterHead(
            model_cfg=model_cfg.RADAR_DENSE_HEAD, input_channels=256,
            num_class=len(class_names), class_names=class_names,
            grid_size=grid_size, point_cloud_range=pcr, voxel_size=voxel_size,
            predict_boxes_when_training=False,
        ),
        }

    try:
        modules = _build_modules()
    finally:
        if not keep_cuda_patch:
            torch.Tensor.cuda = orig_tensor_cuda
            torch.nn.Module.cuda = orig_module_cuda
    return modules, cfg


def build_reference_state_dict(grid=(1440, 1440, 1)):
    """State_dicts of the reference modules under detector scope names
    ({key: np.ndarray}) — the converter-coverage oracle."""
    import torch

    modules, _ = build_reference_modules(grid)
    sd = {}
    with torch.no_grad():
        for scope, mod in modules.items():
            for key, tensor in mod.state_dict().items():
                sd[f"{scope}.{key}"] = np.ascontiguousarray(
                    tensor.detach().cpu().numpy()
                )
    return sd
