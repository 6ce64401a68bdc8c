"""--eval_all watcher round-trip (VERDICT r2 missing #2 / next-round #7).

Covers the reference watcher semantics (tools/test.py:451-506): record-file
skip of already-evaluated epochs, late-arriving checkpoints resetting the
wait window, unloadable-checkpoint skip (not recorded, retried next poll),
and the max-wait exit.
"""

import logging
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent / "tools"))

from test import repeat_eval_ckpt  # noqa: E402  (tools/test.py)


class FakeCkptMgr:
    def __init__(self, epochs):
        self.epochs = list(epochs)

    def list_epochs(self):
        return sorted(self.epochs)


class FakeClock:
    """Deterministic time: advances only via sleep()."""

    def __init__(self):
        self.t = 0.0
        self.sleeps = 0

    def clock(self):
        return self.t

    def sleep(self, dt):
        self.sleeps += 1
        self.t += dt


def test_watcher_skips_recorded_evals_late_arrivals_and_exits(tmp_path):
    record = tmp_path / "eval_list_default.txt"
    record.write_text("1\n")  # epoch 1 already evaluated in a prior run

    mgr = FakeCkptMgr([1, 2])
    clk = FakeClock()
    calls = []

    def sleep(dt):
        clk.sleep(dt)
        # a late checkpoint lands while the watcher is waiting
        if clk.sleeps == 2:
            mgr.epochs.append(3)

    def restore_fn(e):
        return f"state_{e}"

    def eval_fn(e, st):
        assert st == f"state_{e}"
        calls.append(e)
        return {"mAP": 0.1 * e}

    evaluated = repeat_eval_ckpt(
        mgr, record, max_waiting_mins=2.0, restore_fn=restore_fn,
        eval_fn=eval_fn, logger=logging.getLogger("t"),
        sleep=sleep, clock=clk.clock, poll_interval=30.0,
    )

    # epoch 1 skipped (record), 2 evaluated immediately, 3 after its arrival
    assert calls == [2, 3]
    assert evaluated == {1, 2, 3}
    assert sorted(int(x) for x in record.read_text().split()) == [1, 2, 3]
    # after epoch 3 the watcher idled for max_waiting_mins then exited:
    # 120 s / 30 s polls ≈ 5 sleeps total (incl. the 2 before epoch 3 landed)
    assert clk.sleeps >= 5


def test_watcher_retries_unloadable_ckpt_without_recording(tmp_path):
    """A corrupt/mid-write checkpoint returns None from restore: it must NOT
    be recorded as evaluated, and must be retried on the next poll."""
    record = tmp_path / "eval_list.txt"
    mgr = FakeCkptMgr([5])
    clk = FakeClock()
    attempts = []
    calls = []

    def restore_fn(e):
        attempts.append(e)
        return None if len(attempts) < 2 else f"state_{e}"

    def eval_fn(e, st):
        calls.append(e)
        return {}

    repeat_eval_ckpt(
        mgr, record, max_waiting_mins=0.5, restore_fn=restore_fn,
        eval_fn=eval_fn, logger=logging.getLogger("t"),
        sleep=clk.sleep, clock=clk.clock, poll_interval=30.0,
    )
    assert attempts == [5, 5]  # first failed, retried next poll
    assert calls == [5]
    assert record.read_text().split() == ["5"]
    assert clk.sleeps >= 1  # the failed poll slept instead of busy-looping


def test_watcher_immediate_exit_when_all_recorded(tmp_path):
    record = tmp_path / "eval_list.txt"
    record.write_text("1\n2\n")
    mgr = FakeCkptMgr([1, 2])
    clk = FakeClock()

    evaluated = repeat_eval_ckpt(
        mgr, record, max_waiting_mins=0.0, restore_fn=lambda e: None,
        eval_fn=lambda e, st: {}, logger=logging.getLogger("t"),
        sleep=clk.sleep, clock=clk.clock,
    )
    assert evaluated == {1, 2}
    # exits on the first empty poll past the (zero) wait budget
    assert clk.sleeps <= 1
