"""Run the ACTUAL reference training step on CPU torch.

Extends tests/reference_torch.py (which instantiates the real pcdet modules
under stubs) into a fully EXECUTABLE reference: the compute-capable stubs
(dense-backed spconv, real torch_scatter semantics, real modulated deform
conv) let the reference module code FORWARD and BACKWARD, and the real
reference optimizer/scheduler (tools/train_utils/optimization — fastai
OptimWrapper adam_onecycle + OneCycle) drives real updates.

This is the oracle for tests/test_fullstep_parity.py (VERDICT r2 next #6):
the composed step — frozen-teacher eval-BN forward, CMA/AFD/PFD + head
losses, grad clip, one-cycle AdamW — transcribed nowhere; every line here
is either reference code executing or a cited transcription of the ~20-line
orchestration in pillarnet.py / train_utils.py.
"""

from __future__ import annotations

import sys

import numpy as np

from tests.reference_torch import REFERENCE, build_reference_modules

FREEZE_SCOPES = ("vfe", "backbone_3d", "backbone_2d", "dense_head")

MODULE_ORDER = (  # detector3d_template.py:23-26 module_topology (used slots)
    "vfe", "radar_vfe", "backbone_3d", "radar_backbone_3d",
    "backbone_2d", "radar_backbone_2d", "dense_head", "radar_dense_head",
)


def _patch_aligned_iou3d():
    """loss_utils.IouLoss calls iou3d_nms_utils.boxes_aligned_iou3d_gpu
    (CUDA); substitute the repo's numpy rotated-3D-IoU oracle
    (tests/reference_impls.py) — the target is .detach()'ed in the
    reference (radar_center_head.py:316), so no gradient is needed."""
    import torch

    from pcdet.ops.iou3d_nms import iou3d_nms_utils

    from tests.reference_impls import iou_3d

    def aligned(boxes_a, boxes_b):
        a = boxes_a.detach().cpu().numpy()
        b = boxes_b.detach().cpu().numpy()
        out = np.array(
            [iou_3d(a[i, :7], b[i, :7]) for i in range(len(a))], np.float32
        )
        return torch.from_numpy(out).view(-1, 1)

    iou3d_nms_utils.boxes_aligned_iou3d_gpu = aligned


def make_batch_dict(points_list, radar_list, gt_boxes_padded):
    """numpy per-sample points -> the reference batch_dict format
    (dataset_distill.py collate: batch-idx column prepended, gt zero-pad)."""
    import torch

    def cat(plist):
        rows = [
            np.concatenate([np.full((len(p), 1), i, np.float32), p], axis=1)
            for i, p in enumerate(plist)
        ]
        return torch.from_numpy(np.concatenate(rows, axis=0).astype(np.float32))

    return {
        "points": cat(points_list),
        "radar_points": cat(radar_list),
        "gt_boxes": torch.from_numpy(gt_boxes_padded.astype(np.float32)),
        "batch_size": len(points_list),
    }


def state_dict_numpy(modules):
    import torch

    sd = {}
    with torch.no_grad():
        for scope, mod in modules.items():
            for key, tensor in mod.state_dict().items():
                # COPY: .numpy() aliases live parameter memory, and
                # ascontiguousarray is a no-op on contiguous arrays — a view
                # here silently turns the "init" snapshot into the final
                # state once training mutates the params in place
                sd[f"{scope}.{key}"] = np.array(
                    tensor.detach().cpu().numpy(), copy=True)
    return sd


def run_reference_training(points_list, radar_list, gt_boxes_padded,
                           grid, optim_cfg, total_steps, n_steps, seed=0):
    """Build the reference model at `grid`, run n_steps of the reference
    distill train step on the SAME batch. Returns
    (init_sd, final_sd, losses, grads0_sd) with state_dicts as numpy;
    grads0_sd is the INIT state_dict with every parameter value replaced by
    its iteration-0 gradient (pre-clip) — state-dict-shaped so the same
    checkpoint converter maps it onto our param tree for comparison."""
    import torch

    torch.manual_seed(seed)
    modules, _cfg = build_reference_modules(grid=grid, keep_cuda_patch=True)
    _patch_aligned_iou3d()

    model = torch.nn.ModuleDict(dict(modules))
    # freeze pipeline (pillarnet.py:17-23): requires_grad False on teacher
    for scope in FREEZE_SCOPES:
        for p in modules[scope].parameters():
            p.requires_grad = False

    init_sd = state_dict_numpy(modules)

    # the REAL reference optimizer + scheduler (tools/train_utils/optimization)
    tools_path = str(REFERENCE / "tools")
    if tools_path not in sys.path:
        sys.path.insert(0, tools_path)
    from train_utils.optimization import build_optimizer, build_scheduler

    class _Cfg(dict):
        __getattr__ = dict.__getitem__

        def get(self, k, d=None):
            return dict.get(self, k, d)

    ocfg = _Cfg(optim_cfg)
    optimizer = build_optimizer(model, ocfg)
    lr_scheduler, _ = build_scheduler(
        optimizer, total_iters_each_epoch=total_steps, total_epochs=1,
        last_epoch=-1, optim_cfg=ocfg)

    batch = make_batch_dict(points_list, radar_list, gt_boxes_padded)
    losses = []
    grads0_sd = None
    frozen_before = {
        s: [p.detach().clone() for p in modules[s].parameters()]
        for s in FREEZE_SCOPES
    }
    for it in range(n_steps):
        lr_scheduler.step(it)
        model.train()
        optimizer.zero_grad()
        # CLONE the batch tensors: the reference forward MUTATES its batch
        # in place (measured: re-feeding the same dict changes the loss
        # 159.6 -> 132.7 with NO param update). Real training never sees
        # this — the dataloader yields fresh tensors each iteration
        # (train_utils.py:52) — so the oracle must too.
        bd = {k: (v.clone() if torch.is_tensor(v) else v)
              for k, v in batch.items()}
        # pillarnet.py:28-33 — frozen modules run in eval mode every forward
        for scope in MODULE_ORDER:
            if scope in FREEZE_SCOPES:
                modules[scope].eval()
            bd = modules[scope](bd)
        # get_training_distll_loss (pillarnet.py:65-73)
        loss_feature, _tb = modules["radar_backbone_2d"].get_loss(bd)
        loss_rpn, _tb2 = modules["radar_dense_head"].get_loss()
        loss = loss_feature + loss_rpn
        loss.backward()
        if it == 0:
            grads0_sd = dict(init_sd)
            for scope, mod in modules.items():
                for name, p in mod.named_parameters():
                    grads0_sd[f"{scope}.{name}"] = (
                        np.array(p.grad.detach().cpu().numpy(), copy=True)
                        if p.grad is not None
                        else np.zeros_like(p.detach().cpu().numpy()))
        torch.nn.utils.clip_grad_norm_(
            model.parameters(), ocfg["GRAD_NORM_CLIP"])
        optimizer.step()
        losses.append(float(loss.detach()))

    # self-check: the frozen teacher must not have moved (train_utils.py
    # clip/step over requires_grad=False params must be no-ops)
    for s in FREEZE_SCOPES:
        for before, p in zip(frozen_before[s], modules[s].parameters()):
            assert torch.equal(before, p), f"frozen param moved in {s}"

    final_sd = state_dict_numpy(modules)
    return init_sd, final_sd, losses, grads0_sd
