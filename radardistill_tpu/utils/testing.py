"""Shared small-config factory for tests / dryruns / benches.

Builds a structurally faithful RadarDistill config (same keys as
tools/cfgs/radar_distill/radar_distill_train.yaml) at configurable grid
scale, so tests run on tiny grids and the bench on the real 1440² grid.
"""

from __future__ import annotations

from ..config import ConfigDict

CLASS_NAMES = [
    "car", "truck", "construction_vehicle", "bus", "trailer",
    "barrier", "motorcycle", "bicycle", "pedestrian", "traffic_cone",
]

HEADS_GROUPS = [
    ["car"],
    ["truck", "construction_vehicle"],
    ["bus", "trailer"],
    ["barrier"],
    ["motorcycle", "bicycle"],
    ["pedestrian", "traffic_cone"],
]


def head_cfg(distill_pred=True):
    return ConfigDict(
        NAME="Radar_CenterHead",
        DISTILL_PRED=distill_pred,
        CLASS_AGNOSTIC=False,
        IOU_REG="DIoU",
        CLASS_NAMES_EACH_HEAD=[list(g) for g in HEADS_GROUPS],
        SHARED_CONV_CHANNEL=64,
        USE_BIAS_BEFORE_NORM=True,
        NUM_HM_CONV=2,
        SEPARATE_HEAD_CFG=ConfigDict(
            HEAD_ORDER=["center", "center_z", "dim", "rot", "vel", "iou"],
            HEAD_DICT={
                "center": {"out_channels": 2, "num_conv": 2},
                "center_z": {"out_channels": 1, "num_conv": 2},
                "dim": {"out_channels": 3, "num_conv": 2},
                "rot": {"out_channels": 2, "num_conv": 2},
                "vel": {"out_channels": 2, "num_conv": 2},
                "iou": {"out_channels": 1, "num_conv": 2},
            },
        ),
        RECTIFIER=0.5,
        TARGET_ASSIGNER_CONFIG=ConfigDict(
            FEATURE_MAP_STRIDE=8, NUM_MAX_OBJS=500, GAUSSIAN_OVERLAP=0.1, MIN_RADIUS=2
        ),
        LOSS_CONFIG=ConfigDict(
            LOSS_WEIGHTS={
                "cls_weight": 1.0,
                "loc_weight": 0.25,
                "code_weights": [1.0, 1.0, 1.0, 1.0, 1.0, 1.0, 0.2, 0.2, 1.0, 1.0],
            }
        ),
        POST_PROCESSING=ConfigDict(
            SCORE_THRESH=0.1,
            POST_CENTER_LIMIT_RANGE=[-61.2, -61.2, -10.0, 61.2, 61.2, 10.0],
            MAX_OBJ_PER_SAMPLE=500,
            NMS_CONFIG=ConfigDict(
                NMS_TYPE="nms_gpu", NMS_THRESH=0.2, NMS_PRE_MAXSIZE=1000, NMS_POST_MAXSIZE=83
            ),
        ),
    )


def make_model_cfg(
    grid: int = 160,
    teacher: bool = True,
    radar: bool = True,
    distill=True,
    num_max_objs: int = 500,
    k_per_head: int = 500,
    nms_post: int = 83,
):
    """grid must be divisible by 32 (stride 16 + CMA /4 at stride 8)."""
    assert grid % 32 == 0
    extent = grid * 0.075 / 2
    pc_range = [-extent, -extent, -5.0, extent, extent, 3.0]
    vfe = ConfigDict(
        NAME="DynamicPillarVFESimple2D",
        WITH_DISTANCE=False,
        USE_ABSLOTE_XYZ=True,
        USE_CLUSTER_XYZ=True,
        USE_NORM=True,
        NUM_FILTERS=[32],
    )
    neck = ConfigDict(
        NAME="BaseBEVBackboneV2",
        LAYER_NUMS=[5, 5],
        LAYER_STRIDES=[1, 2],
        NUM_FILTERS=[256, 256],
        UPSAMPLE_STRIDES=[1, 2],
        NUM_UPSAMPLE_FILTERS=[128, 128],
    )
    cfg = ConfigDict(NAME="PillarNet")
    if distill is not None:
        cfg.DISTILL = distill
    if teacher:
        cfg.FREEZE_PIPELINE = [
            "DynamicPillarVFESimple2D", "PillarRes18BackBone8x", "BaseBEVBackboneV2", "CenterHead",
        ]
        cfg.VFE = vfe
        cfg.BACKBONE_3D = ConfigDict(NAME="PillarRes18BackBone8x")
        cfg.BACKBONE_2D = neck
        h = head_cfg()
        h.NAME = "CenterHead"
        cfg.DENSE_HEAD = h
    if radar:
        rvfe = ConfigDict(vfe)
        rvfe.NAME = "Radar_DynamicPillarVFESimple2D"
        cfg.RADAR_VFE = rvfe
        cfg.RADAR_BACKBONE_3D = ConfigDict(NAME="Radar_PillarRes18BackBone8x")
        rneck = ConfigDict(neck)
        rneck.NAME = "Radar_Distill"
        rneck.VOXEL_SIZE = [0.075, 0.075, 8.0]
        rneck.POINT_CLOUD_RANGE = pc_range
        rneck.GRID_SIZE = [grid, grid, 1]
        cfg.RADAR_BACKBONE_2D = rneck
        cfg.RADAR_DENSE_HEAD = head_cfg()

    # shrink capacities for small-grid tests
    for key in ("DENSE_HEAD", "RADAR_DENSE_HEAD"):
        if key in cfg:
            cfg[key].TARGET_ASSIGNER_CONFIG.NUM_MAX_OBJS = num_max_objs
            cfg[key].POST_PROCESSING.MAX_OBJ_PER_SAMPLE = k_per_head
            cfg[key].POST_PROCESSING.NMS_CONFIG.NMS_POST_MAXSIZE = nms_post
            cfg[key].POST_PROCESSING.NMS_CONFIG.NMS_PRE_MAXSIZE = min(
                1000, k_per_head * 2
            )

    dataset_info = {
        "grid_size": (grid, grid),
        "voxel_size": (0.075, 0.075, 8.0),
        "point_cloud_range": tuple(pc_range),
        "class_names": tuple(CLASS_NAMES),
    }
    return cfg, dataset_info


def apply_bench_backbone_env(cfg):
    """Apply the bench/bisection backbone-selection env knobs to a model cfg
    (shared by bench.py and tools/*_bench.py so every harness measures the
    same formulation). Since round 3 these are DEV-ONLY overrides: every var
    defaults to unset = leave the cfg exactly as the shipped yaml says
    (VERDICT r2 weak #2 — bench must not silently diverge from production).

      BENCH_S2D=0|1|2    plain / space-to-depth packed stage-1(/2) backbones
      BENCH_AS=radar|both|teacher|0   active-site gather-scatter backbones
      BENCH_AS_RCAPS / BENCH_AS_RDF   radar table capacities / DENSE_FROM
      BENCH_AS_TCAPS / BENCH_AS_TDF   teacher table capacities / DENSE_FROM
    """
    import os

    def _strip(cfg_sub, suffixes):
        base = cfg_sub["NAME"]
        for suf in suffixes:
            if base.endswith(suf):
                base = base[: -len(suf)]
        cfg_sub["NAME"] = base

    s2d = os.environ.get("BENCH_S2D", "")
    if s2d == "0":
        for key in ("BACKBONE_3D", "RADAR_BACKBONE_3D"):
            if key in cfg:
                _strip(cfg[key], ("_S2D2", "_S2D"))
    if s2d in ("1", "2"):
        suffix = "_S2D2" if s2d == "2" else "_S2D"
        if "BACKBONE_3D" in cfg:
            cfg.BACKBONE_3D.NAME = "PillarRes18BackBone8x" + suffix
        if "RADAR_BACKBONE_3D" in cfg:
            cfg.RADAR_BACKBONE_3D.NAME = "Radar_PillarRes18BackBone8x" + suffix
    # BENCH_S2DT=1: teacher consumes the sparse VFE table directly, packed
    # densify inside the S2D backbone (no unpacked stride-1 dense grid)
    if os.environ.get("BENCH_S2DT", "0") == "1" and "BACKBONE_3D" in cfg:
        cfg.BACKBONE_3D.TABLE_INPUT = True
        cfg.BACKBONE_3D.TABLE_CAPACITY = int(
            os.environ.get("BENCH_LIDAR_PTS", 160_000))
    # BENCH_INT8=static|1: frozen-teacher int8 conv mode (dev-only A/B)
    int8_mode = os.environ.get("BENCH_INT8", "")
    if int8_mode and "BACKBONE_3D" in cfg:
        cfg.BACKBONE_3D.INT8 = "static" if int8_mode == "static" else True
    # BENCH_INT8_STAGES=n: chain depth for the static teacher chain (dev A/B)
    stg = os.environ.get("BENCH_INT8_STAGES", "")
    if stg and "BACKBONE_3D" in cfg:
        cfg.BACKBONE_3D.INT8_STAGES = int(stg)
    # BENCH_FP_STAGES=n: fused bf16 chain depth for stages the int8 chain
    # does not cover (dev A/B)
    fps = os.environ.get("BENCH_FP_STAGES", "")
    if fps and "BACKBONE_3D" in cfg:
        cfg.BACKBONE_3D.FP_STAGES = int(fps)
    as_mode = os.environ.get("BENCH_AS", "")
    if as_mode == "0" and "RADAR_BACKBONE_3D" in cfg:
        _strip(cfg.RADAR_BACKBONE_3D, ("_AS",))
    if as_mode in ("radar", "both", "1") and "RADAR_BACKBONE_3D" in cfg:
        cfg.RADAR_BACKBONE_3D.NAME = "Radar_PillarRes18BackBone8x_AS"
        cfg.RADAR_BACKBONE_3D.MAX_ACTIVE = [
            int(x) for x in os.environ.get(
                "BENCH_AS_RCAPS", "4096,4096,4096,4096").split(",")
        ]
        cfg.RADAR_BACKBONE_3D.DENSE_FROM = int(os.environ.get("BENCH_AS_RDF", "5"))
    if as_mode in ("teacher", "both") and "BACKBONE_3D" in cfg:
        cfg.BACKBONE_3D.NAME = "PillarRes18BackBone8x_AS"
        cfg.BACKBONE_3D.MAX_ACTIVE = [
            int(x) for x in os.environ.get(
                "BENCH_AS_TCAPS", "131072,98304,65536,32768").split(",")
        ]
        cfg.BACKBONE_3D.DENSE_FROM = int(os.environ.get("BENCH_AS_TDF", "3"))
    return cfg


def shape_init_state(model, batch, tx, train=True):
    """TrainState from eval_shape + name-aware host fills — no eager init.

    For timing/dryrun tools where the init DISTRIBUTION is irrelevant (TPU
    step time is data-independent; the dryrun's DP-equality assertion holds
    for any params): scale/gamma-like leaves get ones, everything else a
    small deterministic normal, so losses stay finite and non-degenerate.
    Replaces minutes of eager op-by-op init (72 s on the r4 dryrun host,
    ~9.5 min through the axon tunnel in the r4 production cert).
    """
    import jax
    import jax.numpy as jnp
    import numpy as np

    shapes = jax.eval_shape(
        lambda: model.init(jax.random.PRNGKey(0), batch, train))

    def _fill(path, s):
        import zlib

        name = jax.tree_util.keystr(path)
        if "scale" in name or "gamma" in name or "var" in name:
            # BN/LN scales AND running variances must be positive: a
            # random-normal var goes negative -> rsqrt NaN -> NaN loss
            return np.ones(s.shape, s.dtype)
        if "mean" in name or "bias" in name or "beta" in name:
            return np.zeros(s.shape, s.dtype)
        # crc32, not hash(): stable across processes (PYTHONHASHSEED)
        rng = np.random.default_rng(zlib.crc32(name.encode()))
        return (rng.standard_normal(s.shape) * 0.02).astype(s.dtype)

    variables = jax.tree_util.tree_map_with_path(_fill, shapes)
    from ..train.train_step import TrainState

    params = variables["params"]
    return TrainState(
        step=jnp.zeros((), jnp.int32),
        params=params,
        batch_stats=variables.get("batch_stats", {}),
        opt_state=jax.jit(tx.init)(params),
    )
