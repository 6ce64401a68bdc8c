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

    class _SparseConvBase(nn.Module):
        """Registers weight/bias with spconv 2.x shapes: (O, kH, kW, I)."""

        def __init__(self, in_channels, out_channels, kernel_size, stride=1,
                     padding=0, dilation=1, groups=1, bias=True,
                     indice_key=None, **kw):
            super().__init__()
            k = (kernel_size, kernel_size) if isinstance(kernel_size, int) else tuple(kernel_size)
            self.weight = nn.Parameter(torch.zeros(out_channels, *k, in_channels))
            if bias:
                self.bias = nn.Parameter(torch.zeros(out_channels))

    class SubMConv2d(_SparseConvBase):
        pass

    class SparseConv2d(_SparseConvBase):
        pass

    class SparseInverseConv2d(_SparseConvBase):
        pass

    spconv = _stub_module(
        "spconv",
        __version__="2.3.6",
        constants=types.SimpleNamespace(SPCONV_USE_DIRECT_TABLE=True),
        SubMConv2d=SubMConv2d,
        SparseConv2d=SparseConv2d,
        SparseInverseConv2d=SparseInverseConv2d,
        SparseSequential=nn.Sequential,
        SparseModule=nn.Module,
        SparseConvTensor=object,
    )
    sys.modules["spconv.pytorch"] = spconv
    spconv.pytorch = spconv

    _stub_module("openpyxl")
    _stub_module("SharedArray")

    def _jit(*args, **kwargs):
        if len(args) == 1 and callable(args[0]) and not kwargs:
            return args[0]
        return lambda f: f

    _stub_module("numba", jit=_jit, njit=_jit, prange=range)

    # the DCN autograd wrappers (top-level `functions` package in reference)
    fns = _stub_module("functions")
    for sub, cls_names in (
        ("deform_conv_func", ["DeformConvFunction"]),
        ("modulated_deform_conv_func", ["ModulatedDeformConvFunction"]),
        ("deform_psroi_pooling_func", ["DeformRoIPoolingFunction"]),
    ):
        m = _stub_module(
            f"functions.{sub}",
            **{c: type(c, (), {"apply": staticmethod(lambda *a, **k: None)})
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


def build_reference_state_dict(grid=(1440, 1440, 1)):
    """Instantiate every module of the reference RadarDistill detector
    topology (detector3d_template.py module scope names) and concatenate
    their state_dicts under those scopes. Returns {key: np.ndarray}."""
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
    pcr = np.asarray([-54.0, -54.0, -5.0, 54.0, 54.0, 3.0], np.float32)
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
        sd = {}
        with torch.no_grad():
            for scope, mod in modules.items():
                for key, tensor in mod.state_dict().items():
                    sd[f"{scope}.{key}"] = np.ascontiguousarray(
                        tensor.detach().cpu().numpy()
                    )
    finally:
        torch.Tensor.cuda = orig_tensor_cuda
        torch.nn.Module.cuda = orig_module_cuda
    return sd
