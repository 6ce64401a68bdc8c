"""Loss parity tests vs independent torch transcriptions of the reference
formulas (loss_utils.py / radar_distill_final.py)."""

import numpy as np
import jax
import jax.numpy as jnp
import torch
import torch.nn.functional as F

from radardistill_tpu.models.center_head import focal_loss_cornernet, reg_l1_loss
from radardistill_tpu.models.distill import afd_low_loss, pfd_high_loss


def test_focal_loss_matches_torch():
    rng = np.random.RandomState(0)
    pred = np.clip(rng.rand(2, 3, 8, 8).astype(np.float32), 1e-4, 1 - 1e-4)
    gt = np.zeros((2, 3, 8, 8), np.float32)
    gt[0, 1, 3, 3] = 1.0
    gt[1, 0, 2, 5] = 1.0
    gt[0, 1, 3, 4] = 0.6  # gaussian tail

    # torch transcription of neg_loss_cornernet (loss_utils.py:266-301)
    tp, tg = torch.from_numpy(pred), torch.from_numpy(gt)
    pos = tg.eq(1).float()
    neg = tg.lt(1).float()
    neg_w = torch.pow(1 - tg, 4)
    pos_l = (torch.log(tp) * torch.pow(1 - tp, 2) * pos).sum()
    neg_l = (torch.log(1 - tp) * torch.pow(tp, 2) * neg_w * neg).sum()
    want = -(pos_l + neg_l) / pos.sum()

    got = focal_loss_cornernet(jnp.asarray(pred), jnp.asarray(gt))
    np.testing.assert_allclose(float(got), float(want), rtol=1e-5)


def test_focal_loss_no_positives():
    pred = np.full((1, 2, 4, 4), 0.3, np.float32)
    gt = np.zeros((1, 2, 4, 4), np.float32)
    got = float(focal_loss_cornernet(jnp.asarray(pred), jnp.asarray(gt)))
    # no positives -> loss = -sum(neg_loss) over every element (no num_pos norm)
    want = -float(np.log(1 - 0.3) * 0.3 ** 2) * pred.size
    np.testing.assert_allclose(got, want, rtol=1e-5)


def test_reg_loss_matches_torch():
    rng = np.random.RandomState(1)
    pred = rng.randn(2, 10, 6).astype(np.float32)
    tgt = rng.randn(2, 10, 6).astype(np.float32)
    mask = (rng.rand(2, 10) > 0.5).astype(np.int32)

    # torch transcription of _reg_loss (loss_utils.py:347-376)
    tp, tt, tm = torch.from_numpy(pred), torch.from_numpy(tgt), torch.from_numpy(mask)
    num = tm.float().sum()
    m = tm.unsqueeze(2).expand_as(tt).float()
    loss = torch.abs(tp * m - tt * m).sum(dim=(0, 1)) / torch.clamp_min(num, 1.0)

    got = reg_l1_loss(jnp.asarray(pred), jnp.asarray(tgt), jnp.asarray(mask))
    np.testing.assert_allclose(np.asarray(got), loss.numpy(), rtol=1e-5)


def _afd_torch(lidar, radar):
    """torch transcription of Radar_Distill.low_loss (radar_distill_final.py:82-109).
    NCHW inputs."""
    lidar_t, radar_t = torch.from_numpy(lidar), torch.from_numpy(radar)
    B = radar_t.shape[0]
    lidar_mask = (lidar_t.sum(1, keepdim=True) > 0).float()
    radar_act = radar_t.sum(1, keepdim=True)
    activate = (radar_act > 0).float() + lidar_mask * 0.5
    m_rl = (activate == 1.5).float()
    m_rd = (activate == 1.0).float()
    m_rd = m_rd * (m_rl.sum() / m_rd.sum())
    mse = F.mse_loss(radar_t, lidar_t, reduction="none")
    feat = 3e-4 * (mse * m_rl).sum() / B + 5e-5 * (mse * m_rd).sum() / B
    mask_loss = F.l1_loss(radar_act.sigmoid(), lidar_mask)
    return float(feat), float(mask_loss)


def test_afd_matches_torch():
    rng = np.random.RandomState(2)
    lidar = np.abs(rng.randn(2, 16, 10, 10)).astype(np.float32)
    radar = np.abs(rng.randn(2, 16, 10, 10)).astype(np.float32)
    lidar[:, :, :4] = 0.0  # inactive lidar region
    radar[:, :, :, :3] = 0.0  # inactive radar region
    want_f, want_m = _afd_torch(lidar, radar)
    got_f, got_m = afd_low_loss(
        jnp.asarray(lidar.transpose(0, 2, 3, 1)), jnp.asarray(radar.transpose(0, 2, 3, 1))
    )
    np.testing.assert_allclose(float(got_f), want_f, rtol=1e-4)
    np.testing.assert_allclose(float(got_m), want_m, rtol=1e-4)


def test_pfd_matches_torch():
    """torch transcription of high_loss (radar_distill_final.py:111-141)."""
    rng = np.random.RandomState(3)
    B, C, H, W = 2, 8, 6, 6
    r1 = rng.randn(B, C, H, W).astype(np.float32)
    r2 = rng.randn(B, C, H, W).astype(np.float32)
    l1 = rng.randn(B, C, H, W).astype(np.float32)
    l2 = rng.randn(B, C, H, W).astype(np.float32)
    gt_hm = rng.rand(B, 1, H, W).astype(np.float32)
    radar_hm = rng.rand(B, 1, H, W).astype(np.float32)

    tr1, tr2, tl1, tl2 = map(torch.from_numpy, (r1, r2, l1, l2))
    tg, th = torch.from_numpy(gt_hm), torch.from_numpy(radar_hm)
    fp = torch.logical_and(tg < 0.1, th > 0.1)
    fn = torch.logical_and(tg > 0.1, th < 0.1)
    tp_ = torch.logical_and(tg > 0.1, th > 0.1)
    w = torch.zeros_like(th)
    w[tp_ | fn] = 5 / (tp_ | fn).sum()
    w[fp] = 1 / fp.sum()
    hl = (F.l1_loss(tr1.softmax(1), tl1.softmax(1), reduction="none") * w).sum()
    hl8 = (F.l1_loss(tr2.softmax(1), tl2.softmax(1), reduction="none") * w).sum()
    want = float(0.5 * (hl + hl8))

    nhwc = lambda a: jnp.asarray(a.transpose(0, 2, 3, 1))
    got = pfd_high_loss(
        nhwc(r1), nhwc(r2), nhwc(l1), nhwc(l2),
        nhwc(gt_hm), nhwc(radar_hm),
    )
    np.testing.assert_allclose(float(got), want, rtol=1e-4)
