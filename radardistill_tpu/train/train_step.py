"""The single jitted train step (L5 hot loop).

Reference hot loop (tools/train_utils/train_utils.py:33-151): per iteration —
scheduler.step, zero_grad, AMP forward via model_fn, scaled backward (DDP
allreduce), unscale, clip_grad_norm, optimizer step.

TPU-native: ALL of that — teacher forward (frozen, stop_gradient), student
forward, CMA/AFD/PFD + head losses, grad clip, AdamW update with one-cycle
lr/momentum — is ONE jit-compiled function. bf16 compute with f32
params/grads replaces torch AMP GradScaler (bf16 needs no loss scaling).
Data parallelism: see parallel/mesh.py — the same compiled step runs
sharded over the mesh; gradients reduce over ICI inside the step.
"""

from __future__ import annotations

from typing import Any, Dict

import jax
import jax.numpy as jnp
import optax
from flax import struct

from ..models import compute_training_loss


class TrainState(struct.PyTreeNode):
    step: jnp.ndarray
    params: Any
    batch_stats: Any
    opt_state: Any


def create_train_state(model, tx, sample_batch, rng=None, jit_init=False) -> TrainState:
    """jit_init=True compiles the init as ONE program instead of eager
    op-by-op dispatch — through the remote axon tunnel the eager init of
    the production model took ~9.5 min (r4 cert log) vs seconds warm-cached
    jitted. Bit-identical (same graph, deterministic threefry RNG)."""
    rng = rng if rng is not None else jax.random.PRNGKey(0)
    if jit_init:
        variables = jax.jit(lambda r, b: model.init(r, b, True))(rng, sample_batch)
        opt_init = jax.jit(tx.init)
    else:
        variables = model.init(rng, sample_batch, True)
        opt_init = tx.init
    params = variables["params"]
    batch_stats = variables.get("batch_stats", {})
    return TrainState(
        step=jnp.zeros((), jnp.int32),
        params=params,
        batch_stats=batch_stats,
        opt_state=opt_init(params),
    )


def make_train_step(model, tx, model_cfg, class_names, voxel_size, point_cloud_range,
                    mesh=None, sync_bn=True, axis_name="dp"):
    """Returns train_step(state, batch) -> (state, metrics). jit-able.

    BN semantics under data parallelism:
      sync_bn=True (default): the step is jitted with GSPMD shardings over
        the global batch, so BN statistics reduce over ALL replicas — the
        reference's --sync_bn (tools/train.py:144-145), on by default here.
      sync_bn=False + mesh: the per-replica step runs under shard_map, so BN
        normalizes with LOCAL-shard statistics (the reference DDP *default*:
        per-GPU BatchNorm, no SyncBN conversion) while gradients pmean over
        the mesh (the DDP allreduce). Running stats are pmean-averaged so the
        replicated TrainState stays consistent (DDP ranks drift tiny amounts
        and checkpoints save rank 0; averaging is the deterministic analog).
    """

    def loss_fn(params, batch_stats, batch):
        out, mutated = model.apply(
            {"params": params, "batch_stats": batch_stats},
            batch,
            True,
            mutable=["batch_stats", "diagnostics"],
        )
        loss, tb = compute_training_loss(
            model_cfg, out, class_names, voxel_size, point_cloud_range
        )
        diag = mutated.get("diagnostics")
        if diag:
            # sown telemetry scalars (e.g. the CMA's dcn_offset_sat — the
            # fraction of DCN offsets beyond the kernel clamp, VERDICT r3
            # #5); average over the sowing modules
            leaves = jax.tree.leaves(diag)
            tb["dcn_offset_sat"] = sum(
                jnp.mean(leaf) for leaf in leaves) / max(len(leaves), 1)
        return loss, (mutated.get("batch_stats", batch_stats), tb)

    def _step_core(state: TrainState, batch, reduce_fn):
        (loss, (new_bs, tb)), grads = jax.value_and_grad(loss_fn, has_aux=True)(
            state.params, state.batch_stats, batch
        )
        grads, new_bs, loss, tb = reduce_fn(grads, new_bs, loss, tb)
        updates, new_opt = tx.update(grads, state.opt_state, state.params)
        new_params = optax.apply_updates(state.params, updates)
        new_state = state.replace(
            step=state.step + 1,
            params=new_params,
            batch_stats=new_bs,
            opt_state=new_opt,
        )
        metrics = {"loss": loss, **tb}
        return new_state, metrics

    if sync_bn or mesh is None or len(mesh.devices.flat) == 1:
        def train_step(state: TrainState, batch: Dict[str, jnp.ndarray]):
            return _step_core(state, batch, lambda g, bs, l, tb: (g, bs, l, tb))

        return train_step

    from jax.sharding import PartitionSpec as P

    def per_replica_step(state, batch):
        def reduce_fn(grads, new_bs, loss, tb):
            pm = lambda t: jax.tree.map(
                lambda x: jax.lax.pmean(x, axis_name), t
            )
            return pm(grads), pm(new_bs), pm(loss), pm(tb)

        return _step_core(state, batch, reduce_fn)

    return jax.shard_map(
        per_replica_step,
        mesh=mesh,
        in_specs=(P(), P(axis_name)),
        out_specs=(P(), P()),
        check_vma=False,
    )


def make_eval_step(model):
    """eval_step(params, batch_stats, batch) -> outputs incl. final_box_dicts."""

    def eval_step(params, batch_stats, batch):
        return model.apply(
            {"params": params, "batch_stats": batch_stats}, batch, False
        )

    return eval_step
