"""One-cycle schedule vs the reference fastai formula
(learning_schedules_fastai.py:54-77)."""

import numpy as np

from radardistill_tpu.train.optim import one_cycle_lr, one_cycle_mom


def reference_onecycle(total, lr_max, moms, div, pct):
    """numpy transcription of OneCycle/LRSchedulerStep."""
    a1 = int(total * pct)
    low = lr_max / div

    def anneal(start, end, p):
        return end + (start - end) / 2 * (np.cos(np.pi * p) + 1)

    lrs, mms = [], []
    for step in range(total):
        if step < a1:
            lr = anneal(low, lr_max, (step - 0) / (a1 - 0))
            mm = anneal(moms[0], moms[1], step / a1)
        else:
            lr = anneal(lr_max, low / 1e4, (step - a1) / (total - a1))
            mm = anneal(moms[1], moms[0], (step - a1) / (total - a1))
        lrs.append(lr)
        mms.append(mm)
    return np.array(lrs), np.array(mms)


def test_one_cycle_matches_reference():
    total, lr_max, moms, div, pct = 1000, 1e-3, (0.95, 0.85), 10.0, 0.4
    want_lr, want_mom = reference_onecycle(total, lr_max, moms, div, pct)
    lr_fn = one_cycle_lr(total, lr_max, div, pct)
    mom_fn = one_cycle_mom(total, moms, pct)
    got_lr = np.array([float(lr_fn(s)) for s in range(0, total, 37)])
    got_mom = np.array([float(mom_fn(s)) for s in range(0, total, 37)])
    # f32 cosine vs f64 reference: allow float32-level tolerance
    np.testing.assert_allclose(got_lr, want_lr[::37], rtol=2e-4, atol=1e-9)
    np.testing.assert_allclose(got_mom, want_mom[::37], rtol=2e-4)


def test_one_cycle_endpoints():
    lr_fn = one_cycle_lr(100, 1e-3, 10.0, 0.4)
    assert abs(float(lr_fn(0)) - 1e-4) < 1e-9       # low_lr at start
    assert abs(float(lr_fn(40)) - 1e-3) < 1e-6      # peak at pct_start
    assert float(lr_fn(99)) < 1e-6                  # near low/1e4 at end
