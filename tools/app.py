"""Pred-vs-GT BEV viewer — compare student/baseline/teacher detections (and
optional saved feature-map images) side by side.

Reference: tools/app.py:1-375 — a streamlit 3x3 grid over result.pkl /
gt_annos_list.pkl + per-frame feature PNGs (vis_max_feat/<subfolder>),
with score-threshold slider and pred/GT box overlays.

This build: the same data contract (result.pkl written by tools/test.py,
gt_annos_list.pkl beside it) with two frontends:
  * `streamlit run tools/app.py` when streamlit is installed — interactive
    (frame index, score threshold, model columns);
  * plain `python tools/app.py --idx K --out grid.png` everywhere else —
    renders the identical grid headless via matplotlib (this environment
    has no streamlit; the renderer is shared by both paths and unit-tested).
"""

from __future__ import annotations

import argparse
import pickle
import sys
from pathlib import Path
from typing import Optional

import matplotlib
import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

MODEL_ORDER = ["student", "baseline", "teacher"]
ROW_SUBFOLDERS = [
    "low_radar_bev", "low_radar_de_8x", "high_radar_bev_8x", "high_radar_bev",
]
TEACHER_MAP = {
    "low_radar_bev": "low_lidar_bev",
    "low_radar_de_8x": "low_lidar_bev",
    "high_radar_bev_8x": "high_lidar_bev_8x",
    "high_radar_bev": "high_lidar_bev",
}
PC_RANGE = (-54.0, -54.0, 54.0, 54.0)  # x_min, y_min, x_max, y_max (BEV)


def load_pickle(path):
    with open(Path(path), "rb") as f:
        return pickle.load(f)


def bev_corners_xy(box):
    """(x, y, dx, dy, yaw) -> (4, 2) corners (reference app.py:75-84)."""
    x, y, dx, dy, yaw = box[0], box[1], box[3], box[4], box[6]
    c, s = np.cos(yaw), np.sin(yaw)
    local = np.array([
        [dx / 2, dy / 2], [dx / 2, -dy / 2], [-dx / 2, -dy / 2], [-dx / 2, dy / 2]
    ])
    rot = np.array([[c, -s], [s, c]])
    return local @ rot.T + np.array([x, y])


def world_to_pixels(xy, img_shape, pc_range=PC_RANGE):
    """Map BEV world coords into image pixels (origin top-left, y down)."""
    h, w = img_shape[:2]
    x0, y0, x1, y1 = pc_range
    px = (xy[:, 0] - x0) / (x1 - x0) * (w - 1)
    py = (1.0 - (xy[:, 1] - y0) / (y1 - y0)) * (h - 1)
    return np.stack([px, py], axis=1)


def draw_boxes_on_ax(ax, boxes, img_shape, color, lw=1.2, pc_range=PC_RANGE):
    from matplotlib import patches

    for b in np.asarray(boxes).reshape(-1, np.asarray(boxes).shape[-1] if len(boxes) else 9):
        corners = world_to_pixels(bev_corners_xy(b), img_shape, pc_range)
        ax.add_patch(patches.Polygon(corners, closed=True, fill=False,
                                     edgecolor=color, linewidth=lw))


def pred_for_idx(det_annos, idx, score_th):
    """Detections of frame idx above threshold (reference app.py:133-144)."""
    if det_annos is None or idx >= len(det_annos):
        return np.zeros((0, 9)), np.zeros((0,))
    det = det_annos[idx]
    boxes = np.asarray(det.get("pred_boxes", np.zeros((0, 9))))
    scores = np.asarray(det.get("pred_scores", np.zeros(len(boxes))))
    keep = scores >= score_th
    return boxes[keep], scores[keep]


def gt_for_frame(gt_annos, frame_id, idx):
    """GT lookup by frame id with positional fallback (app.py:146-175)."""
    if gt_annos is None:
        return np.zeros((0, 9))
    if isinstance(gt_annos, dict):
        entry = gt_annos.get(frame_id)
    else:
        entry = None
        if frame_id is not None:
            for e in gt_annos:
                if e.get("frame_id") == frame_id:
                    entry = e
                    break
        if entry is None and idx < len(gt_annos):
            entry = gt_annos[idx]
    if entry is None:
        return np.zeros((0, 9))
    return np.asarray(entry.get("gt_boxes", np.zeros((0, 9))))


def find_image(base_root: Optional[str], subfolder: str, idx: int):
    if not base_root:
        return None
    base = Path(base_root) / subfolder
    if not base.exists():
        return None
    fname = f"{idx:06d}.png"
    for p in base.rglob(fname):
        return p
    return None


def render_grid(results, gt_annos, idx, score_th, base_root=None,
                pc_range=PC_RANGE, figsize=3.2):
    """Build the models x feature-rows matplotlib figure. `results` is
    {model_name: det_annos list or None}. Returns the figure."""
    import matplotlib.pyplot as plt

    cols = [m for m in MODEL_ORDER if results.get(m) is not None]
    if not cols:
        raise SystemExit("no result.pkl inputs given")
    rows = [
        r for r in ROW_SUBFOLDERS
        if any(find_image(base_root, TEACHER_MAP[r] if m == "teacher" else r, idx)
               for m in cols)
    ] or ["bev"]

    fig, axes = plt.subplots(
        len(rows), len(cols),
        figsize=(figsize * len(cols), figsize * len(rows)), squeeze=False,
    )
    frame_id = None
    first = results[cols[0]]
    if first and idx < len(first):
        frame_id = first[idx].get("frame_id") or first[idx].get(
            "metadata", {}).get("token")
    gt_boxes = gt_for_frame(gt_annos, frame_id, idx)

    for ci, model in enumerate(cols):
        boxes, _ = pred_for_idx(results[model], idx, score_th)
        for ri, row in enumerate(rows):
            ax = axes[ri][ci]
            sub = TEACHER_MAP.get(row, row) if model == "teacher" else row
            img_path = find_image(base_root, sub, idx) if row != "bev" else None
            if img_path is not None:
                img = matplotlib.image.imread(str(img_path))
                ax.imshow(img)
                shape = img.shape
            else:
                shape = (800, 800)
                ax.set_xlim(0, shape[1])
                ax.set_ylim(shape[0], 0)
                ax.set_facecolor("black")
            draw_boxes_on_ax(ax, gt_boxes, shape, "lime", pc_range=pc_range)
            if len(boxes):
                draw_boxes_on_ax(ax, boxes, shape, "red", pc_range=pc_range)
            ax.set_xticks([])
            ax.set_yticks([])
            if ri == 0:
                ax.set_title(model)
            if ci == 0:
                ax.set_ylabel(row, fontsize=8)
    fig.suptitle(f"frame {idx} ({frame_id})  pred=red gt=green  th={score_th}")
    fig.tight_layout()
    return fig


def _load_inputs(args):
    results = {
        "student": load_pickle(args.student_result) if args.student_result else None,
        "baseline": load_pickle(args.baseline_result) if args.baseline_result else None,
        "teacher": load_pickle(args.teacher_result) if args.teacher_result else None,
    }
    gt = load_pickle(args.gt_annos) if args.gt_annos else None
    return results, gt


def main_headless():
    matplotlib.use("Agg")
    parser = argparse.ArgumentParser()
    parser.add_argument("--student_result", type=str, default=None)
    parser.add_argument("--baseline_result", type=str, default=None)
    parser.add_argument("--teacher_result", type=str, default=None)
    parser.add_argument("--gt_annos", type=str, default=None)
    parser.add_argument("--base_root", type=str, default=None,
                        help="root of saved feature PNGs (vis_max_feat)")
    parser.add_argument("--idx", type=int, default=0)
    parser.add_argument("--score_th", type=float, default=0.3)
    parser.add_argument("--out", type=str, default="bev_grid.png")
    args = parser.parse_args()

    results, gt = _load_inputs(args)
    fig = render_grid(results, gt, args.idx, args.score_th, args.base_root)
    fig.savefig(args.out, dpi=120)
    print(f"wrote {args.out}")


def main_streamlit():
    import streamlit as st

    st.set_page_config(page_title="BEV Feature & BBoxes Viewer", layout="wide")
    d = st.sidebar
    args = argparse.Namespace(
        student_result=d.text_input("student result.pkl", ""),
        baseline_result=d.text_input("baseline result.pkl", ""),
        teacher_result=d.text_input("teacher result.pkl", ""),
        gt_annos=d.text_input("gt_annos_list.pkl", ""),
        base_root=d.text_input("feature png root", ""),
    )
    idx = d.number_input("frame idx", min_value=0, value=0, step=1)
    score_th = d.slider("score threshold", 0.0, 1.0, 0.3, 0.05)
    results, gt = _load_inputs(args)
    st.pyplot(render_grid(results, gt, int(idx), float(score_th),
                          args.base_root or None))


if __name__ == "__main__":
    main_headless()
elif "streamlit" in sys.modules:  # `streamlit run tools/app.py`
    main_streamlit()
