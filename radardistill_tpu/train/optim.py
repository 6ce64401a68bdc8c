"""Optimizer + LR/momentum schedule (optax).

Reference: tools/train_utils/optimization/__init__.py:11-68 (adam_onecycle via
fastai OptimWrapper: Adam betas (0.9, 0.99), decoupled "true" weight decay
applied to every param incl. BN — i.e. AdamW) and
learning_schedules_fastai.py:54-77 (OneCycle: cosine anneal lr
lr/div→lr_max over pct_start, then lr_max→lr/div/1e4; momentum (b1)
moms[0]→moms[1] then back; stepped per iteration).

FREEZE_PIPELINE (pillarnet.py:17-23 requires_grad=False) becomes an optax
mask zeroing updates for the frozen top-level scopes, paired with the
detector's stop_gradient/eval-mode handling.
"""

from __future__ import annotations

import math
from typing import Sequence

import jax.numpy as jnp
import optax


def annealing_cos(start, end, pct):
    cos_out = jnp.cos(math.pi * pct) + 1
    return end + (start - end) / 2 * cos_out


def one_cycle_lr(total_steps: int, lr_max: float, div_factor: float, pct_start: float):
    a1 = int(total_steps * pct_start)
    low_lr = lr_max / div_factor

    def sched(step):
        step = jnp.asarray(step, jnp.float32)
        p1 = jnp.clip(step / max(a1, 1), 0, 1)
        p2 = jnp.clip((step - a1) / max(total_steps - a1, 1), 0, 1)
        up = annealing_cos(low_lr, lr_max, p1)
        down = annealing_cos(lr_max, low_lr / 1e4, p2)
        return jnp.where(step < a1, up, down)

    return sched


def one_cycle_mom(total_steps: int, moms: Sequence[float], pct_start: float):
    a1 = int(total_steps * pct_start)

    def sched(step):
        step = jnp.asarray(step, jnp.float32)
        p1 = jnp.clip(step / max(a1, 1), 0, 1)
        p2 = jnp.clip((step - a1) / max(total_steps - a1, 1), 0, 1)
        up = annealing_cos(moms[0], moms[1], p1)
        down = annealing_cos(moms[1], moms[0], p2)
        return jnp.where(step < a1, up, down)

    return sched


FROZEN_LEAVES = ("down_bias",)  # DCN bias: requires_grad=False in the
                                # reference (modulated_deform_conv.py:41)


def freeze_mask(params, frozen_scopes):
    """True (=trainable) mask pytree; frozen top-level scopes get False,
    as do FROZEN_LEAVES anywhere in the tree.

    Note: frozen params already receive exactly-zero grads (detector /
    ConvNeXtBlock stop_gradient), so Adam moments stay zero; the mask exists
    to cancel the decoupled weight decay, which AdamW would otherwise apply
    to them (the reference's fastai true-wd skips grad-less params)."""

    def walk(tree, frozen):
        if not isinstance(tree, dict):
            return not frozen
        return {
            k: walk(v, frozen or k in FROZEN_LEAVES) for k, v in tree.items()
        }

    return {
        k: walk(v, k in frozen_scopes) for k, v in params.items()
    }


def build_optimizer(optim_cfg, params, total_steps: int, frozen_scopes=()):
    """Build the optax chain for OPTIMIZATION cfg. Supports adam_onecycle
    (the RadarDistill path), adam, sgd (optimization/__init__.py:12-36)."""
    name = optim_cfg.OPTIMIZER
    wd = optim_cfg.get("WEIGHT_DECAY", 0.0)
    clip = optim_cfg.get("GRAD_NORM_CLIP", None)

    if name == "adam_onecycle":
        lr_sched = one_cycle_lr(
            total_steps, optim_cfg.LR, optim_cfg.DIV_FACTOR, optim_cfg.PCT_START
        )
        mom_sched = one_cycle_mom(total_steps, list(optim_cfg.MOMS), optim_cfg.PCT_START)
        betas = tuple(optim_cfg.get("BETAS", (0.9, 0.99)))
        opt = optax.inject_hyperparams(
            lambda learning_rate, b1: optax.adamw(
                learning_rate=learning_rate, b1=b1, b2=betas[1], weight_decay=wd
            )
        )(learning_rate=lr_sched, b1=mom_sched)
    elif name == "adam":
        opt = optax.inject_hyperparams(optax.adamw)(
            learning_rate=optim_cfg.LR, weight_decay=wd
        )
        lr_sched = lambda step: optim_cfg.LR  # noqa: E731
    elif name == "sgd":
        opt = optax.inject_hyperparams(
            lambda learning_rate: optax.chain(
                optax.add_decayed_weights(wd),
                optax.sgd(learning_rate, momentum=optim_cfg.MOMENTUM),
            )
        )(learning_rate=optim_cfg.LR)
        lr_sched = lambda step: optim_cfg.LR  # noqa: E731
    else:
        raise NotImplementedError(name)

    chain = [opt]
    if clip:
        chain = [optax.clip_by_global_norm(float(clip))] + chain
    tx = optax.chain(*chain)

    if params is not None:
        # exclude frozen scopes (and always-frozen leaves like the DCN
        # down_bias) from the optimizer entirely: no moments, no decoupled
        # weight decay, no per-step moment traffic for the frozen teacher
        # (grads are exactly zero via stop_gradient, so the passed-through
        # update is zero)
        import jax

        mask = freeze_mask(params, set(frozen_scopes))
        if not all(jax.tree.leaves(mask)):
            tx = optax.masked(tx, mask)
    return tx, lr_sched


