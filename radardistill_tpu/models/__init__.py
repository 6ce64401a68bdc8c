"""Model layer: registries, build_network, and training-loss assembly.

Reference: pcdet/models/__init__.py:16-54 (build_network / model_fn) and the
per-stage registries (pcdet/models/detectors/__init__.py:19-38 etc.). Here a
single registry maps detector names to flax modules; the stage-level
registries of the reference collapse into the detector's config-driven setup.
"""

from __future__ import annotations

from typing import Any, Dict

import jax.numpy as jnp

from .center_head import (
    HeadSpec,
    centerhead_loss,
    flatten_class_channels,
    flatten_target_heatmaps,
)
from .anchor_detector import AnchorDetector, anchor_training_loss
from .detector import PillarNet
from .distill import distill_loss

DETECTORS = {
    "PillarNet": PillarNet,
    # anchor family (SECOND/PointPillars-style single-branch detectors)
    "PointPillar": AnchorDetector,
    "SECONDNet": AnchorDetector,
}


def build_network(model_cfg, dataset_info: Dict[str, Any], compute_dtype=jnp.float32, remat=False):
    """dataset_info: grid_size (nx, ny), voxel_size, point_cloud_range,
    class_names (build inputs threaded from the data layer, mirroring
    detector3d_template.py:36-50)."""
    cls = DETECTORS[model_cfg.NAME]
    return cls(
        model_cfg=model_cfg,
        grid_size=tuple(dataset_info["grid_size"]),
        voxel_size=tuple(dataset_info["voxel_size"]),
        point_cloud_range=tuple(dataset_info["point_cloud_range"]),
        class_names=tuple(dataset_info["class_names"]),
        compute_dtype=compute_dtype,
        remat=remat,
    )


def compute_training_loss(model_cfg, out: Dict[str, Any], class_names, voxel_size, point_cloud_range):
    """Mode dispatch matching PillarNet.get_training_*_loss
    (pillarnet.py:35-41, :52-80):

      DISTILL absent  -> teacher head loss only
      DISTILL: True   -> distill (CMA/AFD/PFD) + radar head loss
      DISTILL: False  -> radar head loss only
    """
    if model_cfg.NAME in ("PointPillar", "SECONDNet"):
        grid = (
            int(round((point_cloud_range[3] - point_cloud_range[0]) / voxel_size[0])),
            int(round((point_cloud_range[4] - point_cloud_range[1]) / voxel_size[1])),
        )
        return anchor_training_loss(model_cfg, out, class_names, grid, point_cloud_range)

    distill_flag = model_cfg.get("DISTILL", None)
    # the radar head carries the supervised loss whenever a radar branch is
    # trained (distill or student-only); DISTILL absent + teacher-only config
    # -> plain teacher head loss (pillarnet.py:35-41)
    use_radar = "RADAR_DENSE_HEAD" in model_cfg and (
        distill_flag is not None or "DENSE_HEAD" not in model_cfg
    )
    head_cfg = model_cfg.RADAR_DENSE_HEAD if use_radar else model_cfg.DENSE_HEAD
    spec = HeadSpec(head_cfg.CLASS_NAMES_EACH_HEAD, class_names)
    preds = out["radar_preds"] if use_radar else out["lidar_preds"]
    targets = out["target_dicts"]
    hw = targets["heatmaps"].shape[2:4]

    lw = head_cfg.LOSS_CONFIG.LOSS_WEIGHTS
    rpn_loss, tb = centerhead_loss(
        preds,
        targets,
        spec,
        code_weights=lw["code_weights"],
        cls_weight=lw["cls_weight"],
        loc_weight=lw["loc_weight"],
        hw=hw,
        feature_map_stride=head_cfg.TARGET_ASSIGNER_CONFIG.FEATURE_MAP_STRIDE,
        voxel_size=voxel_size,
        point_cloud_range=point_cloud_range,
        with_iou="iou" in head_cfg.SEPARATE_HEAD_CFG.HEAD_DICT,
        iou_reg=bool(head_cfg.get("IOU_REG", False)),
    )

    loss = rpn_loss
    if distill_flag:
        d_in = {
            "x_conv4": out["x_conv4"],
            "radar_spatial_features_8x_2": out["radar_spatial_features_8x_2"],
            "radar_spatial_features_8x_1": out["radar_spatial_features_8x_1"],
            "spatial_features_2d": out["spatial_features_2d"],
            "spatial_features_2d_8x": out["spatial_features_2d_8x"],
            "radar_spatial_features_2d": out["radar_spatial_features_2d"],
            "radar_spatial_features_2d_8x": out["radar_spatial_features_2d_8x"],
            "heatmaps": flatten_target_heatmaps(spec, targets["heatmaps"]),
            "radar_hm_preds": flatten_class_channels(spec, preds["hm"]),
        }
        d_loss, d_tb = distill_loss(d_in)
        loss = loss + d_loss
        tb.update(d_tb)
    if "as_overflow" in out:
        # active-site capacity monitoring: sites dropped this step (should
        # stay 0 — raise MAX_ACTIVE / VFE capacity if it doesn't)
        tb["as_overflow"] = out["as_overflow"]
    return loss, tb
