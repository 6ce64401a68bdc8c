"""bench.py and tools/train.py must build the SAME model (VERDICT r2 weak #2).

Round 2's headline number came from bench-only env knobs selecting the S2D
teacher while the shipped yaml built a slower dense teacher. Round 3 puts the
measured-best formulation in tools/cfgs/radar_distill/radar_distill_train.yaml
itself and makes bench.py load that yaml; these tests pin the contract:

1. The shipped yaml carries the benchmarked formulation (S2D teacher + AS
   radar) — a user of tools/train.py gets what the bench measured.
2. production_cfg() returns the yaml MODEL section byte-identical (no silent
   bench-side mutation), and apply_bench_backbone_env is a no-op when no
   BENCH_* env var is set.
3. production_cfg's dataset_info derivation equals the one tools/train.py
   computes from the real data layer (DataProcessor), and the bench-built
   model's param tree is identical to the train-path-built model's.
"""

import os

import jax
import jax.numpy as jnp
import pytest

from radardistill_tpu.data.processor import DataProcessor
from radardistill_tpu.models import build_network
from radardistill_tpu.utils.production import (
    TRAIN_YAML,
    VAL_YAML,
    load_shipped_cfg,
    production_cfg,
)
from radardistill_tpu.utils.testing import apply_bench_backbone_env


def _deep(o):
    if isinstance(o, dict):
        return {k: _deep(v) for k, v in o.items()}
    if isinstance(o, (list, tuple)):
        return [_deep(v) for v in o]
    return o


def test_shipped_yaml_is_the_benchmarked_formulation():
    cfg = load_shipped_cfg(TRAIN_YAML)
    assert cfg.MODEL.BACKBONE_3D.NAME == "PillarRes18BackBone8x_S2D"
    assert cfg.MODEL.RADAR_BACKBONE_3D.NAME == "Radar_PillarRes18BackBone8x_AS"
    assert cfg.MODEL.RADAR_BACKBONE_3D.DENSE_FROM == 5
    val = load_shipped_cfg(VAL_YAML)
    assert val.MODEL.RADAR_BACKBONE_3D.NAME == "Radar_PillarRes18BackBone8x_AS"


def test_production_cfg_does_not_mutate_yaml(monkeypatch):
    for k in list(os.environ):
        if k.startswith("BENCH_"):
            monkeypatch.delenv(k)
    raw = load_shipped_cfg(TRAIN_YAML)
    cfg, info = production_cfg(TRAIN_YAML, grid=None)
    assert _deep(cfg.MODEL) == _deep(raw.MODEL)
    assert _deep(cfg.OPTIMIZATION) == _deep(raw.OPTIMIZATION)
    # the bench env hook must be a no-op with a clean environment
    apply_bench_backbone_env(cfg.MODEL)
    assert _deep(cfg.MODEL) == _deep(raw.MODEL)
    assert info["grid_size"] == (1440, 1440)
    # native grid: also no mutation through the explicit-grid path
    cfg2, _ = production_cfg(TRAIN_YAML, grid=1440)
    assert _deep(cfg2.MODEL) == _deep(raw.MODEL)


def test_dataset_info_matches_data_layer():
    """production_cfg derives grid/voxel the way the dataset does
    (tools/train.py builds dataset_info from train_set.grid_size)."""
    cfg, info = production_cfg(TRAIN_YAML, grid=None)
    proc = DataProcessor(
        cfg.DATA_CONFIG.DATA_PROCESSOR, cfg.DATA_CONFIG.POINT_CLOUD_RANGE,
        training=True,
    )
    assert tuple(int(x) for x in proc.grid_size[:2]) == info["grid_size"]
    assert tuple(float(x) for x in proc.voxel_size) == info["voxel_size"]
    assert tuple(float(x) for x in proc.point_cloud_range) == info["point_cloud_range"]


@pytest.mark.parametrize("yaml_name", [TRAIN_YAML, VAL_YAML])
def test_bench_and_train_path_build_identical_topology(yaml_name, monkeypatch):
    """The bench-built model (production_cfg + dev grid override) and the
    train.py-path model (yaml MODEL + data-layer dataset_info) must have
    identical param trees."""
    for k in list(os.environ):
        if k.startswith("BENCH_"):
            monkeypatch.delenv(k)
    grid = 160
    # bench path
    cfg_b, info_b = production_cfg(yaml_name, grid=grid)
    apply_bench_backbone_env(cfg_b.MODEL)
    model_b = build_network(cfg_b.MODEL, info_b, compute_dtype=jnp.bfloat16)

    # train.py path: same yaml, dataset_info from the real data layer on the
    # (dev-)scaled point cloud range
    cfg_t, _ = production_cfg(yaml_name, grid=grid)
    proc = DataProcessor(
        cfg_t.DATA_CONFIG.DATA_PROCESSOR, cfg_t.DATA_CONFIG.POINT_CLOUD_RANGE,
        training=True,
    )
    info_t = {
        "grid_size": tuple(int(x) for x in proc.grid_size[:2]),
        "voxel_size": tuple(float(x) for x in proc.voxel_size),
        "point_cloud_range": tuple(float(x) for x in proc.point_cloud_range),
        "class_names": tuple(cfg_t.CLASS_NAMES),
    }
    assert info_t == info_b
    model_t = build_network(cfg_t.MODEL, info_t, compute_dtype=jnp.bfloat16)

    from radardistill_tpu.data.collate import collate_batch
    from radardistill_tpu.data.synthetic import make_scene

    s = make_scene(0, num_lidar=512, num_radar=256, num_boxes=8,
                   pc_range=info_b["point_cloud_range"])
    if "RADAR_VFE" in cfg_b.MODEL and "VFE" not in cfg_b.MODEL:
        del s["points"]  # radar-only eval config
    caps = {"MAX_LIDAR_POINTS": 512, "MAX_RADAR_POINTS": 256, "NUM_MAX_OBJS": 16}
    b = collate_batch([s], caps)
    b.pop("_host", None)
    batch = {k: jnp.asarray(v) for k, v in b.items()}

    train_mode = yaml_name == TRAIN_YAML
    shapes_b = jax.eval_shape(
        lambda: model_b.init(jax.random.PRNGKey(0), batch, train_mode))
    shapes_t = jax.eval_shape(
        lambda: model_t.init(jax.random.PRNGKey(0), batch, train_mode))
    assert jax.tree_util.tree_structure(shapes_b) == jax.tree_util.tree_structure(shapes_t)
    assert jax.tree_util.tree_map(lambda a: a.shape, shapes_b) == jax.tree_util.tree_map(
        lambda a: a.shape, shapes_t)
