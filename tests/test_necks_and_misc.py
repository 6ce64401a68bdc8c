"""Shape/semantics tests for neck variants, map_to_bev, CMA forward, and the
single-process multihost gather path."""

import numpy as np
import jax
import jax.numpy as jnp

from radardistill_tpu.models.bev_backbone import (
    BaseBEVBackbone,
    BaseBEVBackboneV1,
    BaseBEVBackboneV2,
)
from radardistill_tpu.models.distill import CMAHourglass
from radardistill_tpu.models.map_to_bev import HeightCompression, PointPillarScatter
from radardistill_tpu.parallel.multihost import gather_detections, psum_scalar


def test_bev_backbone_v2_shapes_and_quirks():
    m = BaseBEVBackboneV2()
    x4 = jnp.zeros((1, 24, 24, 256))
    x5 = jnp.zeros((1, 12, 12, 256))
    v = m.init(jax.random.PRNGKey(0), x4, x5, False)
    out, x8 = m.apply(v, x4, x5, False)
    assert out.shape == (1, 24, 24, 256)
    # deblock doubles NUM_UPSAMPLE_FILTERS (128 -> 256ch), back at 8x res
    assert x8.shape == (1, 24, 24, 256)
    # block0's first conv consumes the 512-ch concat
    assert v["params"]["block0"]["conv_in"]["conv"]["kernel"].shape == (3, 3, 512, 256)


def test_bev_backbone_v0_multilevel():
    m = BaseBEVBackbone(
        layer_nums=(3, 3), layer_strides=(1, 2), num_filters=(64, 128),
        upsample_strides=(1, 2), num_upsample_filters=(64, 64),
    )
    x = jnp.zeros((1, 32, 32, 32))
    v = m.init(jax.random.PRNGKey(0), x, False)
    out, ret = m.apply(v, x, False)
    assert out.shape == (1, 32, 32, 128)  # concat of two 64-ch upsampled maps
    assert "spatial_features_2x" in ret


def test_bev_backbone_v1():
    m = BaseBEVBackboneV1()
    x4 = jnp.zeros((1, 16, 16, 256))
    x5 = jnp.zeros((1, 8, 8, 256))
    v = m.init(jax.random.PRNGKey(0), x4, x5, False)
    out, _ = m.apply(v, x4, x5, False)
    assert out.shape == (1, 16, 16, 256)


def test_cma_hourglass_shapes():
    m = CMAHourglass(dim=32)
    x = jnp.zeros((1, 16, 16, 32))
    v = m.init(jax.random.PRNGKey(0), x, False)
    final, intermediate = m.apply(v, x, False)
    assert final.shape == (1, 16, 16, 32)
    assert intermediate.shape == (1, 16, 16, 32)


def test_map_to_bev():
    hc = HeightCompression()
    out = hc.apply({}, jnp.zeros((1, 8, 8, 4, 16)))
    assert out.shape == (1, 8, 8, 64)
    ps = PointPillarScatter()
    bev = jnp.ones((1, 8, 8, 16))
    mask = jnp.zeros((1, 8, 8), bool).at[0, 2, 2].set(True)
    out = ps.apply({}, bev, mask)
    assert float(out.sum()) == 16.0


def test_multihost_single_process_passthrough():
    annos = [{"pred_boxes": np.zeros((3, 9)), "pred_scores": np.ones(3),
              "pred_labels": np.ones(3, np.int64)}]
    assert gather_detections(annos) is annos
    assert psum_scalar(2.5) == 2.5


def test_app_renderer():
    """tools/app.py geometry + grid render (reference tools/app.py:75-132)."""
    import matplotlib
    matplotlib.use("Agg")
    from tools.app import bev_corners_xy, gt_for_frame, pred_for_idx, render_grid, world_to_pixels

    c = bev_corners_xy(np.array([1.0, 2.0, 0.0, 4.0, 2.0, 1.0, 0.0, 0, 0]))
    np.testing.assert_allclose(c.mean(axis=0), [1.0, 2.0], atol=1e-6)
    np.testing.assert_allclose(np.sort(c[:, 0]), [-1, -1, 3, 3], atol=1e-6)

    # 90° yaw swaps the extents
    c = bev_corners_xy(np.array([0, 0, 0, 4.0, 2.0, 1.0, np.pi / 2, 0, 0]))
    assert abs(c[:, 1].max() - c[:, 1].min() - 4.0) < 1e-6

    px = world_to_pixels(np.array([[-54.0, -54.0], [54.0, 54.0]]), (800, 800))
    np.testing.assert_allclose(px, [[0, 799], [799, 0]], atol=1e-6)

    det = [{"pred_boxes": np.array([[5, 5, 0, 4, 2, 1.5, 0.3, 0, 0]], np.float32),
            "pred_scores": np.array([0.9], np.float32), "frame_id": "f0"}]
    gt = [{"gt_boxes": np.array([[5, 5, 0, 4, 2, 1.5, 0.3, 0, 0]], np.float32),
           "frame_id": "f0"}]
    b, s = pred_for_idx(det, 0, 0.5)
    assert len(b) == 1
    b, s = pred_for_idx(det, 0, 0.95)
    assert len(b) == 0
    assert len(gt_for_frame(gt, "f0", 0)) == 1
    fig = render_grid({"student": det, "baseline": det}, gt, 0, 0.3)
    assert fig is not None


def test_cachedir_machine_tag_keys_on_cpu_identity():
    """The CPU compile-cache key must change when the host CPU identity
    changes, even if the (VM-masked) feature flags are identical — the
    r3 regression: two fleet hosts with bit-identical flags but different
    family/model mis-executed each other's XLA:CPU AOT entries (all-gather
    rendezvous abort in the 8-device dryrun)."""
    from radardistill_tpu.utils.cachedir import (_tag_from_cpuinfo,
                                                 cpu_cache_dir, machine_tag)

    block = (
        "processor\t: 0\n"
        "vendor_id\t: GenuineIntel\n"
        "cpu family\t: 6\n"
        "model\t\t: 207\n"
        "model name\t: Intel(R) Xeon(R) Processor @ 2.10GHz\n"
        "stepping\t: 2\n"
        "microcode\t: 0x1\n"
        "cpu MHz\t\t: 2100.000\n"
        "flags\t\t: fpu vme de pse avx512f amx_int8\n"
        "bugs\t\t: spectre_v1\n"
    )
    t1 = _tag_from_cpuinfo(block)
    assert len(t1) == 10 and t1 == _tag_from_cpuinfo(block)  # stable

    # identical flags, different microarch -> DIFFERENT tag (the r3 bug)
    other = block.replace("model\t\t: 207", "model\t\t: 143")
    assert _tag_from_cpuinfo(other) != t1

    # flag changes still discriminate too
    assert _tag_from_cpuinfo(block.replace(" amx_int8", "")) != t1

    # non-identity lines (clock, processor index) must NOT affect the tag
    assert _tag_from_cpuinfo(
        block.replace("2100.000", "2399.998").replace(
            "processor\t: 0", "processor\t: 4")) == t1

    # only the FIRST processor block is keyed (SMP dumps repeat blocks)
    assert _tag_from_cpuinfo(block + "\n" + other) == t1

    # live host path: stable and wired into cpu_cache_dir
    tag = machine_tag()
    assert tag == machine_tag()
    assert cpu_cache_dir("/b").endswith("/b/" + tag)
