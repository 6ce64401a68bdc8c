"""BEV visualization of predictions vs GT (L7 misc).

Reference: tools/app.py (matplotlib BEV pred-vs-GT renderer) and
tools/demo.py (open3d point cloud viewer — headless here, so everything
renders to PNG via matplotlib).

Usage:
  python tools/demo.py --cfg_file tools/cfgs/synthetic/smoke.yaml \
      --ckpt_dir output/smoke/smoke/ckpt --out demo.png [--platform cpu]
"""

import argparse
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import numpy as np


def draw_box_bev(ax, box, color, lw=1.0):
    from radardistill_tpu.data.box_np import boxes_to_corners_bev

    corners = boxes_to_corners_bev(box[None, :7])[0]
    loop = np.vstack([corners, corners[:1]])
    ax.plot(loop[:, 0], loop[:, 1], color=color, linewidth=lw)
    # heading tick
    cx, cy = box[0], box[1]
    hx = cx + np.cos(box[6]) * box[3] / 2
    hy = cy + np.sin(box[6]) * box[3] / 2
    ax.plot([cx, hx], [cy, hy], color=color, linewidth=lw)


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("--cfg_file", required=True)
    parser.add_argument("--ckpt_dir", default=None)
    parser.add_argument("--index", type=int, default=0)
    parser.add_argument("--out", default="demo_bev.png")
    parser.add_argument("--platform", default=None)
    args = parser.parse_args()

    if args.platform:
        import jax
        jax.config.update("jax_platforms", args.platform)
    import matplotlib
    matplotlib.use("Agg")
    import matplotlib.pyplot as plt
    import jax
    import jax.numpy as jnp

    from radardistill_tpu.config import ConfigDict, cfg_from_yaml_file
    from radardistill_tpu.data.loader import build_dataloader
    from radardistill_tpu.models import build_network
    from radardistill_tpu.train.checkpoint import CheckpointManager
    from radardistill_tpu.train.optim import build_optimizer
    from radardistill_tpu.train.train_step import create_train_state, make_eval_step

    cfg = ConfigDict()
    cfg_from_yaml_file(args.cfg_file, cfg)
    test_set, test_loader = build_dataloader(
        cfg.DATA_CONFIG, cfg.CLASS_NAMES, 1,
        root_path=cfg.DATA_CONFIG.get("DATA_PATH", None), training=False,
    )
    info = {
        "grid_size": tuple(int(x) for x in test_set.grid_size[:2]),
        "voxel_size": tuple(float(x) for x in test_set.voxel_size),
        "point_cloud_range": tuple(float(x) for x in test_set.point_cloud_range),
        "class_names": tuple(cfg.CLASS_NAMES),
    }
    model = build_network(cfg.MODEL, info)
    batch, host = next(iter(test_loader))
    batch = {k: jnp.asarray(v) for k, v in batch.items()}
    tx, _ = build_optimizer(ConfigDict(OPTIMIZER="adam", LR=1e-3), None, 1)
    state = create_train_state(model, tx, batch)
    if args.ckpt_dir:
        restored = CheckpointManager(args.ckpt_dir).restore(state)
        if restored:
            state = restored[0]

    out = make_eval_step(model)(state.params, state.batch_stats, batch)
    fb = jax.tree.map(np.asarray, out["final_box_dicts"])

    fig, ax = plt.subplots(figsize=(10, 10))
    key = "radar_points" if "radar_points" in batch else "points"
    pts = np.asarray(batch[key][0])
    msk = np.asarray(batch[key + "_mask"][0])
    ax.scatter(pts[msk, 0], pts[msk, 1], s=0.5, c="gray", alpha=0.5)
    if "gt_boxes" in batch:
        for b in np.asarray(batch["gt_boxes"][0]):
            if b[-1] > 0:
                draw_box_bev(ax, b, "green")
    v = fb["valid"][0]
    for b, s in zip(fb["boxes"][0][v], fb["scores"][0][v]):
        if s > 0.3:
            draw_box_bev(ax, b, "red")
    ax.set_aspect("equal")
    ax.set_title("green: GT, red: predictions (score>0.3)")
    fig.savefig(args.out, dpi=120, bbox_inches="tight")
    print(f"wrote {args.out}")


if __name__ == "__main__":
    main()
