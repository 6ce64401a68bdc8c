"""Torch→orbax checkpoint converter, tested against the GROUND-TRUTH key
manifest: tests/reference_torch.py instantiates the actual reference pcdet
module classes (driven by the reference's shipped radar_distill_train.yaml)
and reads their state_dicts — so converter coverage is checked against the
reference code itself, not the converter's own mapping tables. The synthetic
builder is kept as a fast secondary oracle for value-layout checks."""

import sys
from pathlib import Path

import numpy as np
import jax

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from tools.convert_torch_ckpt import Converter
from radardistill_tpu.models import build_network
from radardistill_tpu.utils.testing import make_model_cfg
from tests.test_e2e import make_batch, GRID


def reference_state_dict(rng):
    """Synthesize pcdet-style keys for the RadarDistill topology (teacher+radar)."""
    sd = {}

    def conv(key, o, i, k=3, bias=False):
        sd[f"{key}.weight"] = rng.randn(o, i, k, k).astype(np.float32)
        if bias:
            sd[f"{key}.bias"] = rng.randn(o).astype(np.float32)

    def spconv_w(key, o, i, k=3, bias=False):
        sd[f"{key}.weight"] = rng.randn(o, k, k, i).astype(np.float32)  # spconv2 layout
        if bias:
            sd[f"{key}.bias"] = rng.randn(o).astype(np.float32)

    def bn(key, c):
        sd[f"{key}.weight"] = rng.rand(c).astype(np.float32) + 0.5
        sd[f"{key}.bias"] = rng.randn(c).astype(np.float32)
        sd[f"{key}.running_mean"] = rng.randn(c).astype(np.float32)
        sd[f"{key}.running_var"] = rng.rand(c).astype(np.float32) + 0.5
        sd[f"{key}.num_batches_tracked"] = np.asarray(7)

    def linear(key, o, i, bias=True):
        sd[f"{key}.weight"] = rng.randn(o, i).astype(np.float32)
        if bias:
            sd[f"{key}.bias"] = rng.randn(o).astype(np.float32)

    # VFE (lidar in=14, radar in=15)
    for scope, cin in (("vfe", 14), ("radar_vfe", 15)):
        linear(f"{scope}.pfn_layers.0.linear", 32, cin, bias=False)
        bn(f"{scope}.pfn_layers.0.norm", 32)

    # backbones
    chans = {"conv1": 32, "conv2": 64, "conv3": 128, "conv4": 256}
    for scope in ("backbone_3d", "radar_backbone_3d"):
        # conv1: 2 res blocks
        for b in (0, 1):
            for m, c in (("conv1", 32), ("conv2", 32)):
                spconv_w(f"{scope}.conv1.{b}.{m}", 32, 32, bias=True)
                bn(f"{scope}.conv1.{b}.bn{m[-1]}", 32)
        for stage, (cin, cout) in (("conv2", (32, 64)), ("conv3", (64, 128)), ("conv4", (128, 256))):
            spconv_w(f"{scope}.{stage}.0.0", cout, cin)
            bn(f"{scope}.{stage}.0.1", cout)
            for b in (1, 2):
                for m in ("conv1", "conv2"):
                    spconv_w(f"{scope}.{stage}.{b}.{m}", cout, cout, bias=True)
                    bn(f"{scope}.{stage}.{b}.bn{m[-1]}", cout)
        # conv5 dense
        conv(f"{scope}.conv5.0.0", 256, 256)
        bn(f"{scope}.conv5.0.1", 256)
        for b in (1, 2):
            for m in ("conv1", "conv2"):
                conv(f"{scope}.conv5.{b}.{m}", 256, 256, bias=True)
                bn(f"{scope}.conv5.{b}.bn{m[-1]}", 256)

    # necks (teacher + the one inside Radar_Distill)
    for scope in ("backbone_2d", "radar_backbone_2d"):
        for blk, cin in (("0", 512), ("1", 256)):
            conv(f"{scope}.blocks.{blk}.1", 256, cin)
            bn(f"{scope}.blocks.{blk}.2", 256)
            for k in range(5):
                conv(f"{scope}.blocks.{blk}.{4 + 3 * k}", 256, 256)
                bn(f"{scope}.blocks.{blk}.{5 + 3 * k}", 256)
        sd[f"{scope}.deblocks.0.0.weight"] = rng.randn(256, 256, 2, 2).astype(np.float32)
        bn(f"{scope}.deblocks.0.1", 256)

    # CMA (inside radar_backbone_2d)
    for e in (1, 2, 3):
        for b, down in ((0, True), (1, False)):
            base = f"radar_backbone_2d.encoder_{e}.{b}"
            sd[f"{base}.dwconv.weight"] = rng.randn(256, 1, 7, 7).astype(np.float32)
            sd[f"{base}.dwconv.bias"] = rng.randn(256).astype(np.float32)
            sd[f"{base}.norm.weight"] = rng.randn(256).astype(np.float32)
            sd[f"{base}.norm.bias"] = rng.randn(256).astype(np.float32)
            linear(f"{base}.pwconv1", 1024, 256)
            linear(f"{base}.pwconv2", 256, 1024)
            sd[f"{base}.grn.gamma"] = rng.randn(1, 1, 1, 1024).astype(np.float32)
            sd[f"{base}.grn.beta"] = rng.randn(1, 1, 1, 1024).astype(np.float32)
            if down:
                conv(f"{base}.conv_offset_mask1", 27, 256, bias=True)
                sd[f"{base}.down_layer.weight"] = rng.randn(256, 256, 3, 3).astype(np.float32)
                # frozen-at-init DCN bias (exists despite bias=False)
                sd[f"{base}.down_layer.bias"] = rng.randn(256).astype(np.float32)
        sd[f"radar_backbone_2d.decoder_{e}.0.weight"] = rng.randn(256, 256, 4, 4).astype(np.float32)
        sd[f"radar_backbone_2d.decoder_{e}.0.bias"] = rng.randn(256).astype(np.float32)
        bn(f"radar_backbone_2d.decoder_{e}.1", 256)
        conv(f"radar_backbone_2d.agg_{e}.0", 256, 512, k=1, bias=True)
        bn(f"radar_backbone_2d.agg_{e}.1", 256)

    # heads
    head_classes = [1, 2, 2, 1, 2, 2]
    subheads = {"center": 2, "center_z": 1, "dim": 3, "rot": 2, "vel": 2, "iou": 1}
    for scope in ("dense_head", "radar_dense_head"):
        conv(f"{scope}.shared_conv.0", 64, 256, bias=True)
        bn(f"{scope}.shared_conv.1", 64)
        for h, ncls in enumerate(head_classes):
            for sub, oc in list(subheads.items()) + [("hm", ncls)]:
                conv(f"{scope}.heads_list.{h}.{sub}.0.0", 64, 64, bias=True)
                bn(f"{scope}.heads_list.{h}.{sub}.0.1", 64)
                conv(f"{scope}.heads_list.{h}.{sub}.1", oc, 64, bias=True)
    return sd


def tree_paths(tree, prefix=()):
    out = {}
    for k, v in tree.items():
        if isinstance(v, dict):
            out.update(tree_paths(v, prefix + (k,)))
        else:
            out[prefix + (k,)] = np.asarray(v).shape
    return out


def _assert_converted_matches_model(sd):
    params, stats, unmapped = Converter().convert(sd, max_cls=2)
    assert unmapped == [], unmapped[:10]

    cfg, info = make_model_cfg(grid=GRID, num_max_objs=32, k_per_head=64, nms_post=16)
    model = build_network(cfg, info)
    batch = make_batch()
    variables = model.init(jax.random.PRNGKey(0), batch, False)

    want_p = tree_paths(variables["params"])
    got_p = tree_paths(params)
    missing = set(want_p) - set(got_p)
    extra = set(got_p) - set(want_p)
    assert not extra, sorted(extra)[:10]
    assert not missing, sorted(missing)[:10]
    mismatched = [p for p in want_p if want_p[p] != got_p[p]]
    assert not mismatched, [(p, want_p[p], got_p[p]) for p in mismatched[:5]]

    want_s = tree_paths(variables["batch_stats"])
    got_s = tree_paths(stats)
    assert set(want_s) == set(got_s), (sorted(set(want_s) - set(got_s))[:5],
                                       sorted(set(got_s) - set(want_s))[:5])


def test_converter_covers_model_params():
    rng = np.random.RandomState(0)
    _assert_converted_matches_model(reference_state_dict(rng))


def test_converter_covers_actual_reference_state_dict():
    """Ground truth: keys/shapes from instantiating the reference's own
    nn.Module definitions (SURVEY hard part 6; fails if any reference key
    goes unmapped or any of our params is missed)."""
    import pytest

    from tests.reference_torch import REFERENCE, build_reference_state_dict

    if not REFERENCE.exists():
        pytest.skip("reference checkout not available")
    _assert_converted_matches_model(build_reference_state_dict())
