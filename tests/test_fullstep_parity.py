"""FULL-STEP parity: our jitted distill train step vs the ACTUAL reference
training step (VERDICT r2 next #6).

Oracle: tests/reference_runtime.py executes the real pcdet modules (under
compute-capable stubs), the real reference optimizer/scheduler builders
(tools/train_utils/optimization), grad clip and freeze semantics
(train_utils.py:33-151, optimization/__init__.py:11-68, pillarnet.py:17-73).

Ours: the SAME weights (moved across by the real checkpoint converter,
tools/convert_torch_ckpt.py — so this doubles as a NUMERIC converter test;
test_convert.py only checked key coverage), the same batch, the same
schedule, run through make_train_step.

What is asserted, and why it is split this way:

1. Loss at init matches (rtol 1e-4): the COMPOSED forward — frozen-teacher
   eval-BN, sparse backbones, CMA/DCN, target assignment, every loss term —
   agrees through the converter.
2. The COMPOSED backward matches: full-model gradient vector within 2e-2
   relative L2 of torch autograd (pre-clip, iteration 0) — at the f32
   noise floor: torch's own f32-vs-f64 gradient on this graph differs by
   6.2e-3 (the loss is sharp: ||g|| ~ 11000 for loss ~160).
3. A multi-step TRAJECTORY under sgd matches (losses, params, BN running
   stats): the loop plumbing — clip, wd, momentum, freeze, BN updates —
   composed over several steps. sgd is used for the trajectory because
   Adam's update is sign(g)-driven: for the (many) parameters whose true
   gradient is numerical noise (e.g. conv biases feeding BN), sign(noise)
   differs across frameworks and EVERY such element moves a full ±lr step
   in a different direction — bitwise Adam trajectories are chaotic by
   construction, not a correctness signal (measured: after 1 step every
   param diff is exactly 2*lr_0 on noise-gradient elements).
4. adam_onecycle optimizer/scheduler semantics ARE pinned exactly — against
   the real fastai OptimWrapper + OneCycle with injected deterministic
   gradients (test_adam_onecycle_matches_fastai), where no sign noise
   exists: clip -> true-wd -> bias-corrected Adam with scheduled b1/lr.
"""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from radardistill_tpu.data.collate import collate_batch
from radardistill_tpu.data.synthetic import make_scene
from radardistill_tpu.models import build_network, compute_training_loss
from radardistill_tpu.train.optim import build_optimizer
from radardistill_tpu.train.train_step import TrainState, make_train_step
from radardistill_tpu.utils.testing import CLASS_NAMES, make_model_cfg

from tests.reference_runtime import run_reference_training

GRID = 96
N_LIDAR, N_RADAR, N_BOXES = 600, 200, 8
# 2-step horizon: the composed gradient's f32 noise floor is ~0.6-0.8%
# (see test_composed_backward_matches), and the trajectory amplifies it
# ~6x per step (measured losses: step1 3.5e-5 rel, step2 0.33%, step3 1.9%)
# — beyond 2 steps the comparison measures chaos, not correctness.
N_STEPS = 2
TOTAL_STEPS = 20
FROZEN = ("vfe", "backbone_3d", "backbone_2d", "dense_head")

# sgd for the trajectory leg (see module docstring #3). The scheduler the
# reference builds for sgd is LambdaLR over DECAY_STEP_LIST (epoch-scaled:
# optimization/__init__.py:41-47) — constant LR inside this short run.
OPTIM_SGD = dict(OPTIMIZER="sgd", LR=1e-3, WEIGHT_DECAY=0.01, MOMENTUM=0.9,
                 GRAD_NORM_CLIP=10, LR_WARMUP=False,
                 DECAY_STEP_LIST=[35, 45], LR_DECAY=0.1, LR_CLIP=1e-7)


def _flat(tree, prefix=()):
    out = {}
    for k, v in tree.items():
        if isinstance(v, dict):
            out.update(_flat(v, prefix + (k,)))
        else:
            out[prefix + (k,)] = np.asarray(v)
    return out


def _convert(sd):
    import sys
    from pathlib import Path

    sys.path.insert(0, str(Path(__file__).resolve().parent.parent / "tools"))
    from convert_torch_ckpt import Converter

    params, stats, unmapped = Converter().convert(sd, max_cls=2)
    assert not unmapped, f"unmapped reference keys: {unmapped[:10]}"
    return params, stats


def _rebuild(flat_vals, like, prefix=()):
    out = {}
    for k, v in like.items():
        if isinstance(v, dict):
            out[k] = _rebuild(flat_vals, v, prefix + (k,))
        else:
            out[k] = jnp.asarray(flat_vals[prefix + (k,)], v.dtype)
    return out


@pytest.fixture(scope="module")
def parity_run():
    from radardistill_tpu.config import ConfigDict

    pc_range = (-GRID * 0.075 / 2, -GRID * 0.075 / 2, -5.0,
                GRID * 0.075 / 2, GRID * 0.075 / 2, 3.0)
    scenes = [
        make_scene(i, num_lidar=N_LIDAR, num_radar=N_RADAR,
                   num_boxes=N_BOXES, pc_range=pc_range)
        for i in range(2)
    ]
    # torch reference run (real pcdet modules + real reference optimizer)
    max_m = max(len(s["gt_boxes"]) for s in scenes)
    gt_pad = np.zeros((2, max_m, 10), np.float32)
    for i, s in enumerate(scenes):
        gt_pad[i, : len(s["gt_boxes"])] = s["gt_boxes"]
    init_sd, final_sd, ref_losses, grads0_sd = run_reference_training(
        [s["points"] for s in scenes], [s["radar_points"] for s in scenes],
        gt_pad, grid=(GRID, GRID, 1), optim_cfg=OPTIM_SGD,
        total_steps=TOTAL_STEPS, n_steps=N_STEPS,
    )

    # our run from the SAME (converted) weights on the SAME batch
    params0, stats0 = _convert(init_sd)
    ref_g, _ = _convert(grads0_sd)
    cfg, info = make_model_cfg(grid=GRID, teacher=True, radar=True, distill=True)
    model = build_network(cfg, info, compute_dtype=jnp.float32)

    caps = {"MAX_LIDAR_POINTS": N_LIDAR, "MAX_RADAR_POINTS": N_RADAR,
            "NUM_MAX_OBJS": 500}
    b = collate_batch(scenes, caps)
    b.pop("_host", None)
    batch = {k: jnp.asarray(v) for k, v in b.items()}

    # same freeze set production uses (tools/train.py:128-138); torch-side
    # requires_grad=False also exempts the teacher from wd
    tx, _ = build_optimizer(
        ConfigDict(OPTIM_SGD), params0, total_steps=TOTAL_STEPS,
        frozen_scopes=FROZEN,
    )
    variables = model.init(jax.random.PRNGKey(0), batch, True)
    fp0 = _flat(variables["params"])
    cf0 = _flat(params0)
    assert set(fp0) == set(cf0), (
        f"param tree mismatch: only-ours {sorted(set(fp0) - set(cf0))[:5]} "
        f"only-converted {sorted(set(cf0) - set(fp0))[:5]}")
    assert set(_flat(variables.get("batch_stats", {}))) == set(_flat(stats0))

    params = _rebuild(cf0, variables["params"])
    stats = _rebuild(_flat(stats0), variables.get("batch_stats", {}))

    # composed backward at init (pre-clip), same params
    def loss_fn(p):
        out, _m = model.apply(
            {"params": p, "batch_stats": stats}, batch, True,
            mutable=["batch_stats"])
        loss, _tb = compute_training_loss(
            cfg, out, CLASS_NAMES, info["voxel_size"],
            info["point_cloud_range"])
        return loss
    loss0, our_g = jax.jit(jax.value_and_grad(loss_fn))(params)

    # trajectory: N_STEPS of the jitted train step
    step_fn = jax.jit(make_train_step(
        model, tx, cfg, CLASS_NAMES, info["voxel_size"],
        info["point_cloud_range"]))
    state = TrainState(step=jnp.zeros((), jnp.int32), params=params,
                       batch_stats=stats, opt_state=tx.init(params))
    our_losses = []
    for _ in range(N_STEPS):
        state, metrics = step_fn(state, batch)
        our_losses.append(float(metrics["loss"]))

    tparams, tstats = _convert(final_sd)
    return {
        "loss0": float(loss0),
        "ref_losses": ref_losses,
        "our_losses": our_losses,
        "our_g": _flat(jax.device_get(our_g)),
        "ref_g": _flat(ref_g),
        "ours_p": _flat(jax.device_get(state.params)),
        "ours_s": _flat(jax.device_get(state.batch_stats)),
        "ref_p": _flat(tparams),
        "ref_s": _flat(tstats),
        "init_p": cf0,
    }


def test_loss_matches_at_init(parity_run):
    r = parity_run
    np.testing.assert_allclose(r["loss0"], r["ref_losses"][0], rtol=1e-4)


def test_composed_backward_matches(parity_run):
    """Whole-model gradient vector vs torch autograd (pre-clip)."""
    r = parity_run
    keys = sorted(r["ref_g"])
    num = 0.0
    den = 0.0
    per_scope = {}
    for k in keys:
        d = float(np.sum((r["ref_g"][k] - r["our_g"][k]) ** 2))
        n = float(np.sum(r["ref_g"][k] ** 2))
        num += d
        den += n
        s = per_scope.setdefault(k[0], [0.0, 0.0])
        s[0] += d
        s[1] += n
    rel = np.sqrt(num / max(den, 1e-30))
    # yardstick: torch's OWN f32-vs-f64 gradient diff on this graph is
    # 6.2e-3 (the loss is sharp — ||g|| ~ 11000 for loss ~160 — so f32
    # rounding costs ~0.6% by itself); 2e-2 asserts we sit at that noise
    # floor, not above it
    assert rel < 2e-2, (
        f"composed grad rel diff {rel:.3e}; per-scope "
        f"{ {s: round(float(np.sqrt(d / max(n, 1e-30))), 5) for s, (d, n) in per_scope.items()} }")


def test_sgd_loss_trajectory_matches(parity_run):
    r = parity_run
    np.testing.assert_allclose(r["our_losses"], r["ref_losses"], rtol=1e-3)


def test_params_match_after_steps(parity_run):
    r = parity_run
    bad = []
    for k in sorted(r["ref_p"]):
        ours, ref, init = r["ours_p"][k], r["ref_p"][k], r["init_p"][k]
        move = np.abs(ref - init).max()
        err = np.abs(ours - ref).max()
        # tolerance relative to how far the optimizer moved this tensor.
        # After 1 step the trajectories agree to ~1.5% of the move; by
        # step 2 the landscape's curvature has amplified the ~0.8% f32
        # grad-noise floor to ~25% of the move (same chaos as the loss
        # trajectory, see N_STEPS). 0.5*move is the backstop that still
        # catches semantic bugs (wrong lr/wd/clip/freeze all produce
        # err >= move).
        tol = max(1e-7, 0.5 * max(move, 1e-6))
        if err > tol:
            bad.append((k, float(err), float(move)))
    assert not bad, f"{len(bad)} tensors diverged: {bad[:8]}"


def test_batch_stats_match_after_steps(parity_run):
    r = parity_run
    bad = []
    for k in sorted(r["ref_s"]):
        err = np.abs(r["ours_s"][k] - r["ref_s"][k]).max()
        ref_scale = np.abs(r["ref_s"][k]).max() + 1e-3
        if err > 5e-3 * max(1.0, ref_scale) + 1e-6:
            bad.append((k, float(err)))
    assert not bad, f"{len(bad)} batch_stats diverged: {bad[:8]}"


# ---------------------------------------------------------------------------
# adam_onecycle semantics vs the REAL fastai OptimWrapper + OneCycle
# ---------------------------------------------------------------------------


def test_adam_onecycle_matches_fastai():
    """Injected deterministic grads through the actual reference optimizer
    stack (fastai_optim.py OptimWrapper true_wd/bn_wd + OneCycle +
    clip_grad_norm, exactly as train_utils.py:33-151 composes them) vs our
    optax chain. No model, no sign noise — exact semantics check: scheduled
    lr AND scheduled beta1, bias correction under a changing beta1, true
    weight decay (p *= 1 - wd*lr) incl. BN params (bn_wd=True), global-norm
    clip before the step."""
    import sys

    import torch
    import torch.nn as nn

    from tests.reference_torch import REFERENCE

    tools_path = str(REFERENCE / "tools")
    if tools_path not in sys.path:
        sys.path.insert(0, tools_path)
    from train_utils.optimization import build_optimizer as ref_build_optimizer
    from train_utils.optimization import build_scheduler as ref_build_scheduler

    from radardistill_tpu.config import ConfigDict

    optim = dict(OPTIMIZER="adam_onecycle", LR=3e-3, WEIGHT_DECAY=0.02,
                 MOMS=[0.95, 0.85], PCT_START=0.4, DIV_FACTOR=10,
                 GRAD_NORM_CLIP=0.7,
                 DECAY_STEP_LIST=[35, 45], LR_DECAY=0.1, LR_CLIP=1e-7)
    total, n_steps = 10, 6

    torch.manual_seed(3)
    model = nn.Sequential(nn.Linear(5, 7), nn.BatchNorm1d(7), nn.Linear(7, 3))

    class _Cfg(dict):
        __getattr__ = dict.__getitem__

        def get(self, k, d=None):
            return dict.get(self, k, d)

    ocfg = _Cfg(optim)
    optimizer = ref_build_optimizer(model, ocfg)
    sched, _ = ref_build_scheduler(
        optimizer, total_iters_each_epoch=total, total_epochs=1,
        last_epoch=-1, optim_cfg=ocfg)

    plist = list(model.parameters())
    shapes = [tuple(p.shape) for p in plist]
    rng = np.random.RandomState(0)
    # per-step deterministic grads, norm >> clip so clipping is exercised
    grad_seq = [
        [rng.randn(*s).astype(np.float32) for s in shapes]
        for _ in range(n_steps)
    ]

    for it in range(n_steps):
        sched.step(it)
        optimizer.zero_grad()
        for p, g in zip(plist, grad_seq[it]):
            p.grad = torch.from_numpy(g.copy())
        torch.nn.utils.clip_grad_norm_(
            model.parameters(), optim["GRAD_NORM_CLIP"])
        optimizer.step()
    ref_final = [p.detach().numpy().copy() for p in plist]

    # ours: same initial values, same grads, our optax chain
    init = {f"p{i}": jnp.asarray(grad_seq[0][i] * 0 + p.detach().numpy())
            for i, p in enumerate(model.parameters())}
    # (re-read initial values: model.parameters() already stepped — rebuild)
    torch.manual_seed(3)
    model2 = nn.Sequential(nn.Linear(5, 7), nn.BatchNorm1d(7), nn.Linear(7, 3))
    init = {f"p{i}": jnp.asarray(p.detach().numpy())
            for i, p in enumerate(model2.parameters())}

    tx, _ = build_optimizer(ConfigDict(optim), init, total_steps=total)
    opt_state = tx.init(init)
    params = init
    import optax
    for it in range(n_steps):
        grads = {f"p{i}": jnp.asarray(g) for i, g in enumerate(grad_seq[it])}
        updates, opt_state = tx.update(grads, opt_state, params)
        params = optax.apply_updates(params, updates)

    for i, ref in enumerate(ref_final):
        ours = np.asarray(params[f"p{i}"])
        np.testing.assert_allclose(
            ours, ref, rtol=2e-5, atol=2e-7,
            err_msg=f"param {i} shape {ref.shape}")
