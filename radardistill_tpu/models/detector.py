"""PillarNet detector — dual-branch teacher/student orchestrator.

Reference: pcdet/models/detectors/pillarnet.py:12-96 (mode dispatch, freeze)
and detector3d_template.py:23-26 (module topology: vfe, radar_vfe,
backbone_3d, radar_backbone_3d, backbone_2d, radar_backbone_2d, dense_head,
radar_dense_head — the slots RadarDistill exercises).

TPU re-design: one flax module whose submodule scopes mirror the topology
slot names, returning a `batch_dict`-style output pytree. Mode flags are
STATIC (baked into the trace): `has_teacher`/`has_radar` come from the
config (radar_distill_val.yaml deletes the teacher branch entirely), and
FREEZE_PIPELINE maps to (a) eval-mode BN + stop_gradient on the frozen
branch here, and (b) an optax mask in train/optim.py.

Unlike the reference, the teacher *head* is skipped during distillation
training: its predictions (`lidar_pred_dicts`) are stashed but never read by
any loss (radar_distill_final.py:144-175 consumes only radar preds + GT
heatmaps), so computing them is dead work. It still runs in teacher-eval.
"""

from __future__ import annotations

from typing import Any, Dict, Optional

import jax
import jax.numpy as jnp
from flax import linen as nn

from .backbone_sparse2d import PillarBackBone8x, PillarRes18BackBone8x
from .bev_backbone import BaseBEVBackboneV1, BaseBEVBackboneV2
from .center_head import CenterHead, HeadSpec, assign_targets, decode_and_nms
from .distill import CMAHourglass
from .vfe import (
    DynamicPillarVFE,
    DynamicPillarVFESimple2D,
    DynamicPillarVFESparse,
    MeanVFE,
)

# per-stage registries (reference: pcdet/models/{backbones_3d/vfe,backbones_3d,
# backbones_2d,dense_heads}/__init__.py __all__ dicts). Radar_* twins share
# implementations — twinning is a parameter-scope concern here, not a class
# concern.
VFE_REGISTRY = {
    "DynamicPillarVFESimple2D": DynamicPillarVFESimple2D,
    "Radar_DynamicPillarVFESimple2D": DynamicPillarVFESimple2D,
    "Radar_DynamicPillarVFESimple2D_Test": DynamicPillarVFESimple2D,
    "DynamicPillarVFE": DynamicPillarVFE,
    "MeanVFE": MeanVFE,
    "RADAR_MeanVFE": MeanVFE,
    "DynamicMeanVFE": MeanVFE,
}
from .backbone_tile_sparse import PillarRes18BackBone8xTileSparse  # noqa: E402
from .backbone_s2d import PillarRes18BackBone8xS2D  # noqa: E402
from .backbone_as import PillarRes18BackBone8xAS  # noqa: E402

BACKBONE3D_REGISTRY = {
    "PillarRes18BackBone8x": PillarRes18BackBone8x,
    "Radar_PillarRes18BackBone8x": PillarRes18BackBone8x,
    "PillarBackBone8x": PillarBackBone8x,
    # block-sparse variant: compute only on active 32² tiles (radar branch /
    # inference win; numerics identical given sufficient MAX_TILES)
    "PillarRes18BackBone8x_TileSparse": PillarRes18BackBone8xTileSparse,
    "Radar_PillarRes18BackBone8x_TileSparse": PillarRes18BackBone8xTileSparse,
    # space-to-depth stage-1 variant: exact same math/params, C 32->128 at
    # half resolution (kills the channel-thin layout copies — PERF.md)
    "PillarRes18BackBone8x_S2D": PillarRes18BackBone8xS2D,
    "Radar_PillarRes18BackBone8x_S2D": PillarRes18BackBone8xS2D,
    # S2D with stage 2 also packed (360², 256)
    "PillarRes18BackBone8x_S2D2": PillarRes18BackBone8xS2D,
    "Radar_PillarRes18BackBone8x_S2D2": PillarRes18BackBone8xS2D,
    # active-site (gather-scatter) formulation: compute scales with occupancy,
    # not grid area — the spconv-equivalent production train path (PERF.md)
    "PillarRes18BackBone8x_AS": PillarRes18BackBone8xAS,
    "Radar_PillarRes18BackBone8x_AS": PillarRes18BackBone8xAS,
}
NECK_REGISTRY = {
    "BaseBEVBackboneV2": BaseBEVBackboneV2,
    "BaseBEVBackboneV1": BaseBEVBackboneV1,
    "Radar_Distill": BaseBEVBackboneV2,  # Radar_Distill = CMA + inherited V2 neck
}
from .anchor_head import AnchorHeadSingle  # noqa: E402

HEAD_REGISTRY = {
    "CenterHead": CenterHead,
    "Radar_CenterHead": CenterHead,
    # anchor family (SECOND/PointPillars-style); full detector wiring lives
    # in models/anchor_detector.py (DETECTORS: PointPillar / SECONDNet)
    "AnchorHeadSingle": AnchorHeadSingle,
}

# topology slot -> FREEZE_PIPELINE class names of the reference
FREEZE_NAME_TO_SCOPE = {
    "DynamicPillarVFESimple2D": ("vfe",),
    "PillarRes18BackBone8x": ("backbone_3d",),
    "BaseBEVBackboneV2": ("backbone_2d",),
    "CenterHead": ("dense_head",),
    "Radar_DynamicPillarVFESimple2D": ("radar_vfe",),
    "Radar_PillarRes18BackBone8x": ("radar_backbone_3d",),
    # Radar_Distill = CMA hourglass + inherited neck -> two param scopes
    "Radar_Distill": ("radar_cma", "radar_neck"),
    "Radar_CenterHead": ("radar_dense_head",),
}


def _neck_kwargs(cfg):
    return dict(
        layer_nums=tuple(cfg["LAYER_NUMS"]),
        layer_strides=tuple(cfg["LAYER_STRIDES"]),
        num_filters=tuple(cfg["NUM_FILTERS"]),
        upsample_strides=tuple(cfg["UPSAMPLE_STRIDES"]),
        num_upsample_filters=tuple(cfg["NUM_UPSAMPLE_FILTERS"]),
    )


class PillarNet(nn.Module):
    """Flagship detector. Construct via models.build_network(cfg, dataset_info)."""

    model_cfg: Any          # MODEL ConfigDict (hashed by id; treat as static)
    grid_size: tuple        # (nx, ny) at stride 1
    voxel_size: tuple
    point_cloud_range: tuple
    class_names: tuple
    compute_dtype: Any = jnp.float32
    remat: bool = False     # rematerialize backbone/CMA stages (trade FLOPs
                            # for HBM — the jax.checkpoint analog of never
                            # storing the 1440² stride-1 activations)

    def setup(self):
        cfg = self.model_cfg
        dt = self.compute_dtype
        # flax lifted remat: argnum 0 is the module instance, so the `train`
        # bool is at position 3 (backbone: self, bev, mask, train) / 2 (CMA)
        CMA = (
            nn.remat(CMAHourglass, static_argnums=(2,))
            if self.remat else CMAHourglass
        )
        self.has_teacher = "VFE" in cfg
        self.has_radar = "RADAR_VFE" in cfg
        self.frozen = {
            scope
            for n in cfg.get("FREEZE_PIPELINE", [])
            for scope in FREEZE_NAME_TO_SCOPE.get(n, ())
        }

        def _as_caps(bk_sub):
            """Per-stage active-site capacities, clipped to stage grid area
            (shared by the sparse VFE and the AS backbone)."""
            nx, ny = self.grid_size
            caps = tuple(bk_sub.get("MAX_ACTIVE", PillarRes18BackBone8xAS.caps))
            return tuple(
                min(int(c), (ny // s) * (nx // s)) for c, s in zip(caps, (1, 2, 4, 8))
            )

        def _is_as(bk_sub):
            return bk_sub.get("NAME", "PillarRes18BackBone8x").endswith("_AS")

        def _is_table_s2d(bk_sub):
            return "_S2D" in bk_sub.get("NAME", "") and bool(
                bk_sub.get("TABLE_INPUT", False)
            )

        def make_vfe(sub, bk_sub=None):
            cls = VFE_REGISTRY[sub.get("NAME", "DynamicPillarVFESimple2D")]
            if cls is MeanVFE:
                return MeanVFE(
                    voxel_size=self.voxel_size,
                    point_cloud_range=self.point_cloud_range,
                    grid_size=self.grid_size,
                )
            kwargs = dict(
                num_filters=tuple(sub["NUM_FILTERS"]),
                voxel_size=self.voxel_size,
                point_cloud_range=self.point_cloud_range,
                grid_size=self.grid_size,
                use_norm=sub.get("USE_NORM", True),
                with_distance=sub.get("WITH_DISTANCE", False),
                use_absolute_xyz=sub.get("USE_ABSLOTE_XYZ", True),
                use_cluster_xyz=sub.get("USE_CLUSTER_XYZ", True),
                dtype=dt,
            )
            if bk_sub is not None and _is_as(bk_sub) and cls is DynamicPillarVFESimple2D:
                return DynamicPillarVFESparse(capacity=_as_caps(bk_sub)[0], **kwargs)
            if bk_sub is not None and _is_table_s2d(bk_sub) and cls is DynamicPillarVFESimple2D:
                return DynamicPillarVFESparse(
                    capacity=int(bk_sub.get("TABLE_CAPACITY", 163840)),
                    packed_order=bool(bk_sub.get("PACKED_TABLE", True)),
                    **kwargs
                )
            return cls(**kwargs)

        def make_head(sub):
            spec = HeadSpec(sub["CLASS_NAMES_EACH_HEAD"], self.class_names)
            return CenterHead(
                spec=spec,
                shared_channels=sub["SHARED_CONV_CHANNEL"],
                num_hm_conv=sub["NUM_HM_CONV"],
                use_bias_before_norm=sub.get("USE_BIAS_BEFORE_NORM", False),
                with_iou="iou" in sub["SEPARATE_HEAD_CFG"]["HEAD_DICT"],
                dtype=dt,
            )

        def make_backbone(sub):
            name = sub.get("NAME", "PillarRes18BackBone8x")
            cls = BACKBONE3D_REGISTRY[name]
            kwargs = {}
            int8_mode = sub.get("INT8", False)
            if int8_mode:
                # int8 teacher path (frozen scopes only — not differentiable,
                # eval-BN). INT8: true/'dynamic' = per-conv abs-max scales
                # (layers.int8_conv); INT8: 'static' = the fused chain with
                # BN-derived bounds and int8 activations flowing between
                # convs (layers.py int8 narrative, S2D formulation).
                if int8_mode == "static":
                    assert cls is PillarRes18BackBone8xS2D, int8_mode
                    kwargs["int8_static"] = True
                    # INT8_STAGES: how deep the fused chain runs (1 = stage
                    # 1 only, 5 = whole backbone; backbone_s2d docstring)
                    kwargs["int8_stages"] = int(sub.get("INT8_STAGES", 1))
                else:
                    assert cls in (PillarRes18BackBone8x, PillarRes18BackBone8xS2D)
                    kwargs["int8"] = True
            if cls is PillarRes18BackBone8xS2D and sub.get("FP_STAGES", 0):
                # frozen-teacher fused bf16 chain for stages 2..FP_STAGES
                # (backbone_s2d docstring; composes with the int8 chain —
                # int8-covered stages win)
                kwargs["fp_stages"] = int(sub["FP_STAGES"])
            if cls is PillarRes18BackBone8xTileSparse:
                kwargs = dict(tile=sub.get("TILE", 32), max_tiles=sub.get("MAX_TILES", 512))
            if cls is PillarRes18BackBone8xS2D and name.endswith("_S2D2"):
                kwargs = dict(pack_stage2=True)
            if cls is PillarRes18BackBone8xS2D and _is_table_s2d(sub):
                nx, ny = self.grid_size
                kwargs["table_input"] = True
                kwargs["hw"] = (ny, nx)
                kwargs["packed_table"] = bool(sub.get("PACKED_TABLE", True))
            if cls is PillarRes18BackBone8xAS:
                nx, ny = self.grid_size
                kwargs = dict(
                    hw=(ny, nx),
                    caps=_as_caps(sub),
                    dense_from=int(sub.get("DENSE_FROM", 3)),
                )
            if self.remat:
                cls = nn.remat(cls, static_argnums=(3,))
            return cls(dtype=dt, **kwargs)

        def make_neck(sub):
            cls = NECK_REGISTRY[sub.get("NAME", "BaseBEVBackboneV2")]
            kwargs = _neck_kwargs(sub)
            if cls is BaseBEVBackboneV1:
                kwargs.pop("layer_strides", None)
            return cls(dtype=dt, **kwargs)

        if self.has_teacher:
            self.as_teacher = _is_as(cfg.get("BACKBONE_3D", {}))
            self.s2dt_teacher = _is_table_s2d(cfg.get("BACKBONE_3D", {}))
            self.vfe = make_vfe(cfg["VFE"], cfg.get("BACKBONE_3D", {}))
            self.backbone_3d = make_backbone(cfg.get("BACKBONE_3D", {}))
            self.backbone_2d = make_neck(cfg["BACKBONE_2D"])
            self.dense_head = make_head(cfg["DENSE_HEAD"])
            self.head_spec = self.dense_head.spec
        if self.has_radar:
            self.as_radar = _is_as(cfg.get("RADAR_BACKBONE_3D", {}))
            self.radar_vfe = make_vfe(cfg["RADAR_VFE"], cfg.get("RADAR_BACKBONE_3D", {}))
            self.radar_backbone_3d = make_backbone(cfg.get("RADAR_BACKBONE_3D", {}))
            self.radar_cma = CMA(dim=256, dtype=dt)
            self.radar_neck = make_neck(cfg["RADAR_BACKBONE_2D"])
            self.radar_dense_head = make_head(cfg["RADAR_DENSE_HEAD"])
            self.radar_head_spec = self.radar_dense_head.spec

    def _maybe_freeze(self, scope: str, train: bool):
        """Frozen modules run in eval mode (running BN stats) every forward
        (pillarnet.py:28-33)."""
        return train and (scope not in self.frozen)

    def _stop(self, scope: str, x):
        if scope in self.frozen:
            return jax.tree.map(jax.lax.stop_gradient, x)
        return x

    def __call__(self, batch: Dict[str, jnp.ndarray], train: bool = False):
        cfg = self.model_cfg
        out: Dict[str, Any] = {}
        dt = self.compute_dtype

        # host-precomputed VFE/AS inputs (data/host_precompute.py): sorted
        # points + pillar tables (+ radar rulebooks) built in the dataloader,
        # overlapped with device compute. Absent keys -> device-side build.
        hp_lidar = batch.get("hp_lidar")
        hp_radar = batch.get("hp_radar")
        hp_as = batch.get("hp_as")

        if self.has_teacher:
            # raw (f32) points: coordinate features need full precision;
            # the VFE casts to the compute dtype post-BN (vfe.PFNLayerV2)
            if self.as_teacher:
                tfeats, tuids, tcnt = self.vfe(
                    batch["points"], batch["points_mask"],
                    self._maybe_freeze("vfe", train), hp_lidar,
                )
                tfeats, tuids = self._stop("vfe", (tfeats, tuids))
                ms = self.backbone_3d(
                    tfeats, tuids, self._maybe_freeze("backbone_3d", train),
                    batch.get("hp_as_lidar"),
                )
                out["as_overflow"] = out.get("as_overflow", 0) + ms.get(
                    "as_overflow", 0
                ) + jnp.sum(jnp.maximum(tcnt - self.vfe.capacity, 0))
            elif self.s2dt_teacher:
                tfeats, tuids, tcnt = self.vfe(
                    batch["points"], batch["points_mask"],
                    self._maybe_freeze("vfe", train), hp_lidar,
                )
                tfeats, tuids = self._stop("vfe", (tfeats, tuids))
                ms = self.backbone_3d(
                    tfeats, tuids, self._maybe_freeze("backbone_3d", train),
                    batch.get("hp_masks"),
                )
                out["as_overflow"] = out.get("as_overflow", 0) + jnp.sum(
                    jnp.maximum(tcnt - self.vfe.capacity, 0)
                )
            else:
                bev, mask = self.vfe(
                    batch["points"], batch["points_mask"],
                    self._maybe_freeze("vfe", train),
                )
                bev, mask = self._stop("vfe", (bev, mask))
                ms = self.backbone_3d(bev, mask, self._maybe_freeze("backbone_3d", train))
            ms = self._stop("backbone_3d", ms)
            out["x_conv4"] = ms["x_conv4"]
            out["x_conv5"] = ms["x_conv5"]
            sp2d, sp2d_8x = self.backbone_2d(
                ms["x_conv4"], ms["x_conv5"], self._maybe_freeze("backbone_2d", train)
            )
            sp2d, sp2d_8x = self._stop("backbone_2d", (sp2d, sp2d_8x))
            out["spatial_features_2d"] = sp2d
            out["spatial_features_2d_8x"] = sp2d_8x
            # teacher head: skipped during distill training (dead compute);
            # run for teacher-only eval / plain training (and during init so
            # its params exist for checkpointing / teacher eval)
            if (not self.has_radar) or (not train) or self.is_initializing():
                out["lidar_preds"] = self._stop(
                    "dense_head",
                    self.dense_head(sp2d, self._maybe_freeze("dense_head", train)),
                )

        if self.has_radar:
            # Radar_DynamicPillarVFESimple2D_Test reads `points` (radar
            # returns live there in the reference's radar-only eval datasets,
            # dynamic_pillar_vfe.py:315-373); accept either key
            if "radar_points" in batch:
                rpts, rpts_mask = batch["radar_points"], batch["radar_points_mask"]
            else:
                rpts, rpts_mask = batch["points"], batch["points_mask"]
            if self.as_radar:
                rfeats, ruids, rcnt = self.radar_vfe(
                    rpts, rpts_mask, self._maybe_freeze("radar_vfe", train),
                    hp_radar,
                )
                rms = self.radar_backbone_3d(
                    rfeats, ruids, self._maybe_freeze("radar_backbone_3d", train),
                    hp_as,
                )
                # capacity-overflow monitoring counter (VFE table + backbone
                # stage caps); logged as tb `as_overflow`
                out["as_overflow"] = out.get("as_overflow", 0) + rms.get(
                    "as_overflow", 0
                ) + jnp.sum(jnp.maximum(rcnt - self.radar_vfe.capacity, 0))
            else:
                rbev, rmask = self.radar_vfe(
                    rpts, rpts_mask,
                    self._maybe_freeze("radar_vfe", train),
                )
                rms = self.radar_backbone_3d(
                    rbev, rmask, self._maybe_freeze("radar_backbone_3d", train)
                )
            out["radar_x_conv4"] = rms["x_conv4"]
            cma_train = self._maybe_freeze("radar_backbone_2d", train)
            dense_8x_2, dense_8x_1 = self.radar_cma(rms["x_conv4"], cma_train)
            out["radar_spatial_features_8x_2"] = dense_8x_2
            out["radar_spatial_features_8x_1"] = dense_8x_1
            rsp2d, rsp2d_8x = self.radar_neck(dense_8x_2, rms["x_conv5"], cma_train)
            out["radar_spatial_features_2d"] = rsp2d
            out["radar_spatial_features_2d_8x"] = rsp2d_8x
            out["radar_preds"] = self.radar_dense_head(
                rsp2d, self._maybe_freeze("radar_dense_head", train)
            )

        # targets (training): one assignment shared by head + PFD losses
        if train and "gt_boxes" in batch:
            spec = self.radar_head_spec if self.has_radar else self.head_spec
            head_cfg = cfg["RADAR_DENSE_HEAD"] if self.has_radar else cfg["DENSE_HEAD"]
            ta = head_cfg["TARGET_ASSIGNER_CONFIG"]
            fmap = out["radar_spatial_features_2d"] if self.has_radar else out["spatial_features_2d"]
            out["target_dicts"] = assign_targets(
                batch["gt_boxes"],
                spec,
                (fmap.shape[1], fmap.shape[2]),
                ta["FEATURE_MAP_STRIDE"],
                self.voxel_size,
                self.point_cloud_range,
                num_max_objs=ta["NUM_MAX_OBJS"],
                gaussian_overlap=ta["GAUSSIAN_OVERLAP"],
                min_radius=ta["MIN_RADIUS"],
            )

        # decode at eval (final_box_dicts; radar head wins when present)
        if not train:
            head_cfg = cfg["RADAR_DENSE_HEAD"] if self.has_radar else cfg["DENSE_HEAD"]
            spec = self.radar_head_spec if self.has_radar else self.head_spec
            preds = out["radar_preds"] if self.has_radar else out["lidar_preds"]
            pp = head_cfg["POST_PROCESSING"]
            fmap = out["radar_spatial_features_2d"] if self.has_radar else out["spatial_features_2d"]
            out["final_box_dicts"] = decode_and_nms(
                preds,
                spec,
                (fmap.shape[1], fmap.shape[2]),
                head_cfg["TARGET_ASSIGNER_CONFIG"]["FEATURE_MAP_STRIDE"],
                self.voxel_size,
                self.point_cloud_range,
                pp["POST_CENTER_LIMIT_RANGE"],
                k_per_head=pp["MAX_OBJ_PER_SAMPLE"],
                score_thresh=pp["SCORE_THRESH"],
                rectifier=head_cfg.get("RECTIFIER", 0.0),
                nms_thresh=pp["NMS_CONFIG"]["NMS_THRESH"],
                nms_pre=pp["NMS_CONFIG"]["NMS_PRE_MAXSIZE"],
                nms_post=pp["NMS_CONFIG"]["NMS_POST_MAXSIZE"],
                with_iou="iou" in head_cfg["SEPARATE_HEAD_CFG"]["HEAD_DICT"],
                with_vel="vel" in head_cfg["SEPARATE_HEAD_CFG"]["HEAD_DICT"],
            )
        return out
