"""Config system: _BASE_CONFIG_ merge, dotted overrides, real config files."""

from pathlib import Path

from radardistill_tpu.config import ConfigDict, cfg_from_list, cfg_from_yaml_file

REPO = Path(__file__).resolve().parent.parent


def test_base_config_merge(tmp_path):
    (tmp_path / "base.yaml").write_text(
        "A: 1\nB:\n  C: 2\n  D: 3\n"
    )
    (tmp_path / "child.yaml").write_text(
        f"_BASE_CONFIG_: {tmp_path}/base.yaml\nB:\n  D: 9\nE: 5\n"
    )
    cfg = cfg_from_yaml_file(tmp_path / "child.yaml")
    assert cfg.A == 1 and cfg.B.C == 2 and cfg.B.D == 9 and cfg.E == 5


def test_cfg_from_list_overrides():
    cfg = ConfigDict(MODEL=ConfigDict(DISTILL=True, LR=0.001), X=[1, 2])
    cfg_from_list(["MODEL.DISTILL", "False", "MODEL.LR", "0.01"], cfg)
    assert cfg.MODEL.DISTILL is False
    assert cfg.MODEL.LR == 0.01


def test_shipped_configs_load():
    for rel in (
        "tools/cfgs/radar_distill/radar_distill_train.yaml",
        "tools/cfgs/radar_distill/radar_distill_val.yaml",
        "tools/cfgs/nuscenes_models/pillarnet.yaml",
        "tools/cfgs/nuscenes_models/pillarnet_radar.yaml",
        "tools/cfgs/synthetic/smoke.yaml",
    ):
        cfg = cfg_from_yaml_file(REPO / rel)
        assert "MODEL" in cfg and "DATA_CONFIG" in cfg, rel
        assert cfg.MODEL.NAME == "PillarNet"

    train = cfg_from_yaml_file(REPO / "tools/cfgs/radar_distill/radar_distill_train.yaml")
    # key reference keys survive the merge
    assert train.MODEL.DISTILL is True
    assert train.MODEL.FREEZE_PIPELINE[0] == "DynamicPillarVFESimple2D"
    assert train.DATA_CONFIG.POINT_CLOUD_RANGE[0] == -54.0
    assert train.HOOK.DisableAugmentationHook.NUM_LAST_EPOCHS == 10
    val = cfg_from_yaml_file(REPO / "tools/cfgs/radar_distill/radar_distill_val.yaml")
    assert "VFE" not in val.MODEL  # teacher branch deleted
    assert val.MODEL.RADAR_VFE.NAME == "Radar_DynamicPillarVFESimple2D_Test"
