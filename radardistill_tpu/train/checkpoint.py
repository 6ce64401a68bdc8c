"""Checkpointing (orbax) + teacher→student init surgery.

Reference contract (tools/train_utils/train_utils.py:260-293 pickle .pth of
{epoch, it, model_state, optimizer_state, version}; rotation keeping
max_ckpt_save_num :209-214; auto-resume from newest loadable ckpt
tools/train.py:160-172; non-strict pretrained overlay
detector3d_template.py:442-465; teacher→student `radar_` key duplication
/root/reference/ckpt.py:17-22).

TPU-native: orbax PyTreeCheckpointer over the TrainState pytree; the ckpt
surgery becomes a pytree scope-copy (`duplicate_teacher_to_radar`); the
"pretrained overlay" becomes a partial pytree update by matching subtree
paths.
"""

from __future__ import annotations

import re
import shutil
from pathlib import Path
from typing import Optional

import numpy as np
import orbax.checkpoint as ocp

TEACHER_TO_RADAR = {
    "vfe": "radar_vfe",
    "backbone_3d": "radar_backbone_3d",
    "dense_head": "radar_dense_head",
    # backbone_2d (neck) weights seed the radar neck inside radar_backbone_2d;
    # the CMA hourglass has no teacher counterpart and keeps its fresh init.
    "backbone_2d": "radar_neck",
}


def duplicate_teacher_to_radar(params: dict) -> dict:
    """The `ckpt.py` surgery: copy every teacher scope under its radar twin
    so the student starts from the LiDAR weights."""
    out = dict(params)
    for src, dst in TEACHER_TO_RADAR.items():
        if src in params and dst in out:
            src_tree = params[src]
            dst_tree = out[dst]
            # copy matching sub-paths only (radar VFE first linear differs in
            # input dim: radar has 6 raw feats vs lidar 5)
            out[dst] = _overlay(dst_tree, src_tree)
    return out


def _overlay(dst, src):
    """Recursively copy src leaves into dst where paths+shapes match."""
    if isinstance(dst, dict) and isinstance(src, dict):
        return {
            k: _overlay(dst[k], src[k]) if k in src else dst[k] for k in dst
        }
    if hasattr(dst, "shape") and hasattr(src, "shape") and dst.shape == src.shape:
        return src
    return dst


class CheckpointManager:
    """Rotating checkpoint manager (ckpt_%d + latest_model semantics)."""

    def __init__(self, ckpt_dir, max_ckpt_save_num: int = 30):
        self.ckpt_dir = Path(ckpt_dir)
        self.ckpt_dir.mkdir(parents=True, exist_ok=True)
        self.max_keep = max_ckpt_save_num
        self._ckptr = ocp.PyTreeCheckpointer()

    def _path(self, tag) -> Path:
        return self.ckpt_dir / f"checkpoint_epoch_{tag}"

    def save(self, state, epoch: int, it: int | None = None, tag: str | None = None):
        payload = {
            "state": state,
            "epoch": np.asarray(epoch),
            "it": np.asarray(it if it is not None else int(state.step)),
            "version": "radardistill_tpu+0.1.0",
        }
        path = self._path(tag if tag is not None else epoch)
        if path.exists():
            shutil.rmtree(path)
        self._ckptr.save(path.absolute(), payload)
        self._rotate()
        return path

    def _rotate(self):
        ckpts = sorted(
            self.ckpt_dir.glob("checkpoint_epoch_[0-9]*"), key=lambda p: p.stat().st_mtime
        )
        while len(ckpts) > self.max_keep:
            shutil.rmtree(ckpts.pop(0))

    def list_epochs(self):
        out = []
        for p in self.ckpt_dir.glob("checkpoint_epoch_*"):
            m = re.match(r"checkpoint_epoch_(\d+)$", p.name)
            if m:
                out.append(int(m.group(1)))
        return sorted(out)

    def restore(self, state_template, epoch: int | None = None):
        """Restore newest (or given-epoch) ckpt; returns (state, epoch, it)
        or None. Corrupted ckpts are skipped newest-first
        (tools/train.py:160-172 semantics). If the template's optimizer-state
        structure doesn't match (e.g. evaluating with a different optimizer),
        falls back to a params/batch_stats-only overlay."""
        epochs = self.list_epochs() if epoch is None else [epoch]
        candidates = [self._path(e) for e in reversed(epochs)]
        if epoch is None:
            # the time-interval mid-epoch save resumes with highest priority
            # when it is the newest file (train_utils.py:143-151 latest_model)
            latest = self._path("latest")
            if latest.exists():
                newest = max(
                    (p.stat().st_mtime for p in candidates if p.exists()),
                    default=0.0,
                )
                if latest.stat().st_mtime >= newest:
                    candidates.insert(0, latest)
                else:
                    candidates.append(latest)
        template = {
            "state": state_template,
            "epoch": np.asarray(0),
            "it": np.asarray(0),
            "version": "radardistill_tpu+0.1.0",
        }
        for path in candidates:
            if not path.exists():
                continue
            try:
                payload = self._ckptr.restore(path.absolute(), item=template)
                return payload["state"], int(payload["epoch"]), int(payload["it"])
            except Exception:
                pass
            try:  # params-only fallback (raw pytree restore)
                raw = self._ckptr.restore(path.absolute())
                state = state_template.replace(
                    params=_overlay(state_template.params, raw["state"]["params"]),
                    batch_stats=_overlay(
                        state_template.batch_stats, raw["state"]["batch_stats"]
                    ),
                )
                return state, int(np.asarray(raw["epoch"])), int(np.asarray(raw["it"]))
            except Exception:
                continue
        return None

    def load_params_from_file(self, state, path, pretrained_overlay: Optional[str] = None):
        """Non-strict load: overlay matching params/batch_stats subtrees
        (detector3d_template.py:442-465: `--pretrained_model` dict-updates
        over `--ckpt`)."""
        restored = self._ckptr.restore(Path(path).absolute())
        params = _overlay(state.params, restored["state"]["params"])
        bs = _overlay(state.batch_stats, restored["state"]["batch_stats"])
        state = state.replace(params=params, batch_stats=bs)
        if pretrained_overlay:
            restored2 = self._ckptr.restore(Path(pretrained_overlay).absolute())
            state = state.replace(
                params=_overlay(state.params, restored2["state"]["params"]),
                batch_stats=_overlay(state.batch_stats, restored2["state"]["batch_stats"]),
            )
        return state
