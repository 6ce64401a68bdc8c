"""Anchor-based single-branch detectors (PointPillar / SECONDNet surface).

Reference: pcdet/models/detectors/pointpillar.py + second_net.py (inherited
OpenPCDet families, SURVEY §2.5): VFE -> (scatter to BEV) -> BaseBEVBackbone
-> AnchorHeadSingle, with axis-aligned target assignment in training and
residual decode + class-agnostic NMS at eval
(anchor_head_template.py:195-230, detector3d_template.post_processing).

TPU formulation: anchors are a STATIC per-class stack baked at trace time;
assignment and decode are fully vectorized with fixed shapes (padded GT /
fixed NMS capacities) so the whole step jits to one XLA program.
"""

from __future__ import annotations

from typing import Any, Dict

import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn

from ..ops.nms import class_agnostic_nms
from .anchor_head import (
    AnchorHeadSingle,
    ResidualCoder,
    anchor_head_loss,
    assign_anchor_targets,
    decode_anchor_predictions,
    generate_anchors,
)
from .bev_backbone import BaseBEVBackbone
from .vfe import DynamicPillarVFESimple2D, PillarVFE


def build_anchor_assets(head_cfg, grid_size, point_cloud_range, class_names):
    """Static anchor stack + per-class thresholds from ANCHOR_GENERATOR_CONFIG.

    Returns (anchors_per_class [(H,W,n,7)...], anchors_flat (A,7),
    class_ids 1-based, matched_thr, unmatched_thr, n_per_loc, coder).
    """
    gen_cfgs = head_cfg["ANCHOR_GENERATOR_CONFIG"]
    stride = head_cfg["TARGET_ASSIGNER_CONFIG"].get("FEATURE_MAP_STRIDE", 2)
    anchors = generate_anchors(gen_cfgs, grid_size, point_cloud_range, stride)
    name_to_id = {n: i + 1 for i, n in enumerate(class_names)}
    class_ids = [name_to_id[c["class_name"]] for c in gen_cfgs]
    matched = [c.get("matched_threshold", 0.6) for c in gen_cfgs]
    unmatched = [c.get("unmatched_threshold", 0.45) for c in gen_cfgs]
    coder = ResidualCoder(
        code_size=7,
        encode_angle_by_sincos=head_cfg["TARGET_ASSIGNER_CONFIG"].get(
            "ENCODE_ANGLE_BY_SINCOS", False
        ),
    )
    n_per_loc = sum(a.shape[2] for a in anchors)
    flat = jnp.concatenate(anchors, axis=-2).reshape(-1, 7)
    return anchors, flat, class_ids, matched, unmatched, n_per_loc, coder


class AnchorDetector(nn.Module):
    """PointPillar-style detector: dense-pillar VFE -> BaseBEVBackbone FPN ->
    AnchorHeadSingle. Construct via models.build_network (NAME: PointPillar
    or SECONDNet)."""

    model_cfg: Any
    grid_size: tuple
    voxel_size: tuple
    point_cloud_range: tuple
    class_names: tuple
    compute_dtype: Any = jnp.float32
    remat: bool = False

    def setup(self):
        cfg = self.model_cfg
        dt = self.compute_dtype
        vfe_cfg = cfg["VFE"]
        if vfe_cfg.get("NAME", "DynamicPillarVFESimple2D") == "PillarVFE":
            self.vfe = PillarVFE(
                num_filters=tuple(vfe_cfg["NUM_FILTERS"]),
                voxel_size=self.voxel_size,
                point_cloud_range=self.point_cloud_range,
                grid_size=self.grid_size,
                use_norm=vfe_cfg.get("USE_NORM", True),
                with_distance=vfe_cfg.get("WITH_DISTANCE", False),
                use_absolute_xyz=vfe_cfg.get("USE_ABSLOTE_XYZ", True),
            )
        else:
            self.vfe = DynamicPillarVFESimple2D(
                num_filters=tuple(vfe_cfg["NUM_FILTERS"]),
                voxel_size=self.voxel_size,
                point_cloud_range=self.point_cloud_range,
                grid_size=self.grid_size,
                use_norm=vfe_cfg.get("USE_NORM", True),
                with_distance=vfe_cfg.get("WITH_DISTANCE", False),
                use_absolute_xyz=vfe_cfg.get("USE_ABSLOTE_XYZ", True),
                use_cluster_xyz=vfe_cfg.get("USE_CLUSTER_XYZ", True),
                dtype=dt,
            )
        b2d = cfg["BACKBONE_2D"]
        bb = BaseBEVBackbone
        if self.remat:
            bb = nn.remat(bb, static_argnums=(2,))
        self.backbone_2d = bb(
            layer_nums=tuple(b2d["LAYER_NUMS"]),
            layer_strides=tuple(b2d["LAYER_STRIDES"]),
            num_filters=tuple(b2d["NUM_FILTERS"]),
            upsample_strides=tuple(b2d.get("UPSAMPLE_STRIDES", ())),
            num_upsample_filters=tuple(b2d.get("NUM_UPSAMPLE_FILTERS", ())),
            dtype=dt,
        )
        hc = cfg["DENSE_HEAD"]
        (self.anchors_per_class, self.anchors_flat, self.anchor_class_ids,
         self.matched_thr, self.unmatched_thr, n_per_loc, self.coder) = (
            build_anchor_assets(hc, self.grid_size, self.point_cloud_range,
                                self.class_names)
        )
        self.dense_head = AnchorHeadSingle(
            num_class=len(self.class_names),
            num_anchors_per_location=n_per_loc,
            code_size=self.coder.code_size,
            num_dir_bins=hc.get("NUM_DIR_BINS", 2),
            use_dir=hc.get("USE_DIRECTION_CLASSIFIER", True),
            dtype=dt,
        )

    def __call__(self, batch: Dict[str, jnp.ndarray], train: bool = False):
        cfg = self.model_cfg
        dt = self.compute_dtype
        out: Dict[str, Any] = {}
        if "voxels" in batch:
            bev, mask = self.vfe(
                batch["voxels"].astype(dt), batch["voxel_num_points"],
                batch["voxel_coords"], train,
            )
        else:
            bev, mask = self.vfe(batch["points"], batch["points_mask"], train)
        sp2d, _ = self.backbone_2d(bev, train)
        out["spatial_features_2d"] = sp2d
        preds = self.dense_head(sp2d, train)
        out["anchor_preds"] = preds

        if train and "gt_boxes" in batch:
            out["target_dicts"] = assign_anchor_targets(
                self.anchors_per_class, batch["gt_boxes"],
                class_ids=self.anchor_class_ids, coder=self.coder,
                matched_thr=self.matched_thr, unmatched_thr=self.unmatched_thr,
            )

        if not train:
            hc = cfg["DENSE_HEAD"]
            pp = cfg.get("POST_PROCESSING", hc.get("POST_PROCESSING", {}))
            scores, boxes = decode_anchor_predictions(
                {k: v.astype(jnp.float32) for k, v in preds.items()},
                self.anchors_flat, self.coder,
                dir_offset=hc.get("DIR_OFFSET", 0.78539),
                dir_limit_offset=hc.get("DIR_LIMIT_OFFSET", 0.0),
                num_dir_bins=hc.get("NUM_DIR_BINS", 2),
            )
            best = jnp.max(scores, axis=-1)              # (B, A)
            labels1 = jnp.argmax(scores, axis=-1) + 1    # 1-based global
            nms_cfg = pp.get("NMS_CONFIG", {})
            post = int(nms_cfg.get("NMS_POST_MAXSIZE", 83))

            def one(b, s):
                sel, sel_valid = class_agnostic_nms(
                    b, s, jnp.ones(s.shape, bool),
                    nms_thresh=float(nms_cfg.get("NMS_THRESH", 0.2)),
                    pre_max=int(nms_cfg.get("NMS_PRE_MAXSIZE", 1024)),
                    post_max=post,
                    score_thresh=float(pp.get("SCORE_THRESH", 0.1)),
                )
                return sel, sel_valid

            sel, sel_valid = jax.vmap(one)(boxes, best)
            take = jax.vmap(lambda a, i: a[i])
            out["final_box_dicts"] = {
                "boxes": take(boxes, sel),
                "scores": take(best, sel),
                "labels": take(labels1, sel),
                "valid": sel_valid,
            }
        return out


def anchor_training_loss(model_cfg, out, class_names, grid_size,
                         point_cloud_range):
    """Loss assembly for AnchorDetector (anchor_head_template.get_loss)."""
    hc = model_cfg["DENSE_HEAD"]
    _, flat, _, _, _, _, coder = build_anchor_assets(
        hc, grid_size, point_cloud_range, class_names
    )
    lw = hc["LOSS_CONFIG"]["LOSS_WEIGHTS"]
    return anchor_head_loss(
        out["anchor_preds"], out["target_dicts"], flat,
        num_class=len(class_names), coder=coder,
        cls_weight=lw.get("cls_weight", 1.0),
        loc_weight=lw.get("loc_weight", 2.0),
        dir_weight=lw.get("dir_weight", 0.2),
        code_weights=lw.get("code_weights", None),
        dir_offset=hc.get("DIR_OFFSET", 0.78539),
        num_dir_bins=hc.get("NUM_DIR_BINS", 2),
    )
