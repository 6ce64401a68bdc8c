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
