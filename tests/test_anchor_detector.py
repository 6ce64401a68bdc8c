"""End-to-end anchor-family detector (PointPillar/SECONDNet surface):
build -> train step (loss decreases, grads flow) -> eval decode shapes."""

import numpy as np
import jax
import jax.numpy as jnp
import optax

from radardistill_tpu.config import ConfigDict
from radardistill_tpu.models import build_network, compute_training_loss

PCR = [-8.0, -8.0, -5.0, 8.0, 8.0, 3.0]
INFO = {
    "grid_size": (32, 32),
    "voxel_size": (0.5, 0.5, 8.0),
    "point_cloud_range": PCR,
    "class_names": ("car", "pedestrian"),
}


def make_cfg():
    return ConfigDict(
        NAME="PointPillar",
        VFE=ConfigDict(NAME="DynamicPillarVFESimple2D", NUM_FILTERS=[32]),
        BACKBONE_2D=ConfigDict(
            LAYER_NUMS=[2], LAYER_STRIDES=[2], NUM_FILTERS=[64],
            UPSAMPLE_STRIDES=[1], NUM_UPSAMPLE_FILTERS=[64],
        ),
        DENSE_HEAD=ConfigDict(
            NAME="AnchorHeadSingle",
            USE_DIRECTION_CLASSIFIER=True,
            DIR_OFFSET=0.78539,
            NUM_DIR_BINS=2,
            ANCHOR_GENERATOR_CONFIG=[
                {"class_name": "car", "anchor_sizes": [[4.6, 1.9, 1.7]],
                 "anchor_rotations": [0, 1.57], "anchor_bottom_heights": [-1.8],
                 "align_center": True, "matched_threshold": 0.55,
                 "unmatched_threshold": 0.4},
                {"class_name": "pedestrian", "anchor_sizes": [[0.8, 0.6, 1.7]],
                 "anchor_rotations": [0, 1.57], "anchor_bottom_heights": [-1.8],
                 "align_center": True, "matched_threshold": 0.4,
                 "unmatched_threshold": 0.25},
            ],
            TARGET_ASSIGNER_CONFIG=ConfigDict(FEATURE_MAP_STRIDE=2),
            LOSS_CONFIG=ConfigDict(
                LOSS_WEIGHTS={"cls_weight": 1.0, "loc_weight": 2.0,
                              "dir_weight": 0.2, "code_weights": [1.0] * 7},
            ),
        ),
        POST_PROCESSING=ConfigDict(
            SCORE_THRESH=0.1,
            NMS_CONFIG=ConfigDict(NMS_THRESH=0.2, NMS_PRE_MAXSIZE=256,
                                  NMS_POST_MAXSIZE=50),
        ),
    )


def make_batch(bs=2, n_pts=256, seed=0):
    rng = np.random.RandomState(seed)
    pts = rng.uniform(-7, 7, (bs, n_pts, 4)).astype(np.float32)
    pts[..., 2] = rng.uniform(-2, 0, (bs, n_pts))
    gt = np.zeros((bs, 5, 8), np.float32)
    gt[0, 0] = [0, 0, -1, 4.6, 1.9, 1.7, 0.0, 1]
    gt[0, 1] = [3, 3, -1, 0.8, 0.6, 1.7, 0.3, 2]
    gt[1, 0] = [-2, 4, -1, 4.6, 1.9, 1.7, 1.57, 1]
    return {
        "points": jnp.asarray(pts),
        "points_mask": jnp.ones((bs, n_pts), bool),
        "gt_boxes": jnp.asarray(gt),
    }


def test_anchor_detector_train_and_eval():
    cfg = make_cfg()
    model = build_network(cfg, INFO)
    batch = make_batch()
    variables = model.init(jax.random.PRNGKey(0), batch, True)
    params, batch_stats = variables["params"], variables["batch_stats"]
    tx = optax.adam(3e-3)
    opt_state = tx.init(params)

    @jax.jit
    def step(params, batch_stats, opt_state):
        def loss_fn(p):
            out, mut = model.apply(
                {"params": p, "batch_stats": batch_stats}, batch, True,
                mutable=["batch_stats"],
            )
            loss, tb = compute_training_loss(
                cfg, out, INFO["class_names"], INFO["voxel_size"], PCR
            )
            return loss, (mut["batch_stats"], tb)

        (loss, (bs_new, tb)), g = jax.value_and_grad(loss_fn, has_aux=True)(params)
        upd, opt_state = tx.update(g, opt_state, params)
        return optax.apply_updates(params, upd), bs_new, opt_state, loss, tb

    losses = []
    for _ in range(8):
        params, batch_stats, opt_state, loss, tb = step(params, batch_stats, opt_state)
        losses.append(float(loss))
    assert np.isfinite(losses).all()
    assert losses[-1] < losses[0]  # learning
    assert set(tb) >= {"rpn_loss_cls", "rpn_loss_loc", "rpn_loss_dir"}

    # eval: fixed-shape decode + NMS output
    out = model.apply({"params": params, "batch_stats": batch_stats}, batch, False)
    fbd = out["final_box_dicts"]
    assert fbd["boxes"].shape == (2, 50, 7)
    assert fbd["scores"].shape == (2, 50)
    assert fbd["labels"].shape == (2, 50)
    assert fbd["valid"].dtype == bool
    b = np.asarray(fbd["boxes"])
    assert np.isfinite(b).all()


def test_anchor_detector_fixed_voxel_vfe():
    # SECONDNet-style config driven through the fixed-size PillarVFE input
    cfg = make_cfg()
    cfg.NAME = "SECONDNet"
    cfg.VFE = ConfigDict(NAME="PillarVFE", NUM_FILTERS=[32])
    model = build_network(cfg, INFO)
    rng = np.random.RandomState(1)
    V, P = 64, 8
    voxels = rng.uniform(-7, 7, (1, V, P, 4)).astype(np.float32)
    nump = rng.randint(1, P + 1, (1, V))
    coords = np.stack([
        np.zeros((1, V), np.int64),
        rng.randint(0, 32, (1, V)),
        rng.randint(0, 32, (1, V)),
    ], -1)
    batch = {
        "voxels": jnp.asarray(voxels),
        "voxel_num_points": jnp.asarray(nump),
        "voxel_coords": jnp.asarray(coords),
    }
    variables = model.init(jax.random.PRNGKey(0), batch, False)
    out = model.apply(variables, batch, False)
    assert out["final_box_dicts"]["boxes"].shape == (1, 50, 7)
