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


def _np_restore_args(tree):
    """RestoreArgs forcing host-local numpy deserialization for every leaf.

    Without this, orbax restores leaves as committed ``jax.Array``s; in a
    multi-process runtime that path runs cross-host collectives (Gloo
    broadcast of array metadata), which deadlocks when ranks reach restore
    at different times or down different code paths (observed: 2-process
    CLI eval, GetKeyValue timeout). Checkpoint IO must be collective-free:
    every host reads the files independently."""
    import jax

    def _args(leaf):
        # array leaves (anything with a shape: np/jax arrays when mapping
        # over a template, ArrayMetadata when mapping over on-disk metadata)
        # deserialize as numpy; strings/scalars keep the default object path.
        if hasattr(leaf, "shape"):
            return ocp.RestoreArgs(restore_type=np.ndarray)
        return ocp.RestoreArgs()

    return jax.tree.map(_args, tree)


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
        self._ckptr_cached = None

    @property
    def _ckptr(self):
        """Lazy, PROCESS-ISOLATED checkpointer.

        Payloads are host-local numpy (save callers device_get first), so
        checkpoint IO needs no cross-process coordination. The default orbax
        multiprocess barriers are actively harmful here: when ranks fail or
        retry restores at different points (e.g. the template-mismatch →
        params-only fallback), the barrier sequences desync and every rank
        deadlocks in Gloo (observed: 2-process CLI eval, 30 s GetKeyValue
        timeout). Isolating each process (active_processes={self}) removes
        every barrier; save() is rank-0-guarded instead, matching the
        reference's DDP rank-0 torch.save (train_utils.py:260-293)."""
        if self._ckptr_cached is None:
            import jax

            if jax.process_count() > 1:
                me = jax.process_index()
                self._ckptr_cached = ocp.Checkpointer(
                    ocp.PyTreeCheckpointHandler(),
                    multiprocessing_options=ocp.options.MultiprocessingOptions(
                        primary_host=me,
                        active_processes={me},
                        barrier_sync_key_prefix=f"proc{me}",
                    ),
                )
            else:
                self._ckptr_cached = ocp.PyTreeCheckpointer()
        return self._ckptr_cached

    def _path(self, tag) -> Path:
        return self.ckpt_dir / f"checkpoint_epoch_{tag}"

    def save(self, state, epoch: int, it: int | None = None, tag: str | None = None):
        import jax

        path = self._path(tag if tag is not None else epoch)
        if jax.process_count() > 1 and jax.process_index() != 0:
            return path  # rank-0-only writes (reference DDP torch.save)
        payload = {
            "state": state,
            "epoch": np.asarray(epoch),
            "it": np.asarray(it if it is not None else int(state.step)),
            "version": "radardistill_tpu+0.1.0",
        }
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
        import logging

        log = logging.getLogger(__name__)
        for path in candidates:
            if not path.exists():
                continue
            try:
                payload = self._ckptr.restore(
                    path.absolute(), item=template,
                    restore_args=_np_restore_args(template),
                )
                return payload["state"], int(payload["epoch"]), int(payload["it"])
            except Exception as e:
                log.warning("full-template restore of %s failed (%s: %s); "
                            "trying params-only fallback", path, type(e).__name__, e)
            try:  # params-only fallback (raw pytree restore)
                raw = self._raw_restore(path)
                state = state_template.replace(
                    params=_overlay(state_template.params, raw["state"]["params"]),
                    batch_stats=_overlay(
                        state_template.batch_stats, raw["state"]["batch_stats"]
                    ),
                )
                return state, int(np.asarray(raw["epoch"])), int(np.asarray(raw["it"]))
            except Exception as e:
                log.warning("restore of %s failed (%s: %s); skipping as corrupt",
                            path, type(e).__name__, e)
                continue
        return None

    def _raw_restore(self, path: Path):
        """Template-free restore as host-local numpy (tree structure taken
        from the on-disk metadata, so no collective jax.Array path runs)."""
        meta = self._ckptr.metadata(Path(path).absolute())
        tree = getattr(meta, "item_metadata", meta)
        tree = getattr(tree, "tree", tree)
        return self._ckptr.restore(
            Path(path).absolute(), restore_args=_np_restore_args(tree)
        )

    def load_params_from_file(self, state, path, pretrained_overlay: Optional[str] = None):
        """Non-strict load: overlay matching params/batch_stats subtrees
        (detector3d_template.py:442-465: `--pretrained_model` dict-updates
        over `--ckpt`)."""
        restored = self._raw_restore(path)
        params = _overlay(state.params, restored["state"]["params"])
        bs = _overlay(state.batch_stats, restored["state"]["batch_stats"])
        state = state.replace(params=params, batch_stats=bs)
        if pretrained_overlay:
            restored2 = self._raw_restore(pretrained_overlay)
            state = state.replace(
                params=_overlay(state.params, restored2["state"]["params"]),
                batch_stats=_overlay(state.batch_stats, restored2["state"]["batch_stats"]),
            )
        return state
