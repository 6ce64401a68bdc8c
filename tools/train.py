"""Training entry point (L7).

Reference: tools/train.py:22-259 — arg surface (--cfg_file, --batch_size,
--epochs, --extra_tag, --ckpt, --pretrained_model, --set overrides, --seed,
--max_ckpt_save_num, --merge_all_iters_to_one_epoch, ...), dist init,
dataloaders, network, optimizer, resume, train_model, final eval sweep.

TPU-native differences: no torch.distributed launcher — one process per host
with `jax.distributed.initialize()` when JAX_PROCESS_COUNT>1; DDP wrap is
replaced by jit-with-shardings over the device mesh; AMP is bf16 compute.
"""

import argparse
import datetime
import os
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import numpy as np


def parse_config():
    parser = argparse.ArgumentParser()
    parser.add_argument("--cfg_file", type=str, required=True)
    parser.add_argument("--batch_size", type=int, default=None, help="global batch size")
    parser.add_argument("--epochs", type=int, default=None)
    parser.add_argument("--workers", type=int, default=4)
    parser.add_argument("--extra_tag", type=str, default="default")
    parser.add_argument("--ckpt", type=str, default=None)
    parser.add_argument("--pretrained_model", type=str, default=None)
    parser.add_argument("--init_from_teacher", type=str, default=None,
                        help="teacher ckpt: duplicate weights into the radar branch (ckpt.py surgery)")
    parser.add_argument("--seed", type=int, default=666)
    parser.add_argument("--fix_random_seed", action="store_true")
    parser.add_argument("--ckpt_save_interval", type=int, default=1)
    parser.add_argument("--max_ckpt_save_num", type=int, default=30)
    parser.add_argument("--merge_all_iters_to_one_epoch", action="store_true")
    parser.add_argument("--sync_bn", type=int, choices=(0, 1), default=None,
                        help="1: global-batch BN (our default; reference --sync_bn). "
                             "0: per-replica BN statistics (reference DDP default). "
                             "Overrides OPTIMIZATION.SYNC_BN.")
    parser.add_argument("--num_epochs_to_eval", type=int, default=1,
                        help="post-train: evaluate the checkpoints of the last N epochs "
                             "(reference tools/train.py:241-259; 0 disables)")
    parser.add_argument("--set", dest="set_cfgs", default=None, nargs=argparse.REMAINDER)
    parser.add_argument("--bf16", action="store_true", default=True)
    parser.add_argument("--no-bf16", dest="bf16", action="store_false")
    parser.add_argument("--platform", type=str, default=None, help="jax platform override (cpu for smoke tests)")
    parser.add_argument("--profile_dir", type=str, default=None,
                        help="capture a jax.profiler trace of the first training steps")
    parser.add_argument("--log_interval", type=int, default=50,
                        help="iterations between train-loop log lines; 1 forces a "
                             "per-step loss readback (honest per-step timing through "
                             "the axon tunnel — used by the production-cert run)")
    args = parser.parse_args()

    from radardistill_tpu.config import ConfigDict, cfg_from_list, cfg_from_yaml_file

    cfg = ConfigDict()
    cfg_from_yaml_file(args.cfg_file, cfg)
    cfg.TAG = Path(args.cfg_file).stem
    if args.set_cfgs is not None:
        cfg_from_list(args.set_cfgs, cfg)
    return args, cfg


def main():
    args, cfg = parse_config()
    if args.platform:
        import jax
        jax.config.update("jax_platforms", args.platform)
    import jax
    import jax.numpy as jnp
    from jax.sharding import NamedSharding, PartitionSpec as P

    from radardistill_tpu.data.loader import build_dataloader
    from radardistill_tpu.models import build_network
    from radardistill_tpu.parallel.mesh import make_mesh
    from radardistill_tpu.train.checkpoint import CheckpointManager, duplicate_teacher_to_radar
    from radardistill_tpu.train.optim import build_optimizer
    from radardistill_tpu.train.train_step import create_train_state, make_train_step
    from radardistill_tpu.train.trainer import train_model
    from radardistill_tpu.utils.common import (
        create_logger, maybe_init_distributed, set_random_seed,
    )

    maybe_init_distributed()

    output_dir = Path("output") / cfg.TAG / args.extra_tag
    ckpt_dir = output_dir / "ckpt"
    output_dir.mkdir(parents=True, exist_ok=True)
    log_file = output_dir / f"log_train_{datetime.datetime.now():%Y%m%d-%H%M%S}.txt"
    logger = create_logger(log_file, rank=jax.process_index())
    logger.info(f"devices: {jax.devices()}")

    if args.fix_random_seed:
        set_random_seed(args.seed)

    batch_size = args.batch_size or cfg.OPTIMIZATION.BATCH_SIZE_PER_GPU * jax.device_count()
    epochs = args.epochs or cfg.OPTIMIZATION.NUM_EPOCHS

    train_set, train_loader = build_dataloader(
        cfg.DATA_CONFIG, cfg.CLASS_NAMES, batch_size,
        root_path=cfg.DATA_CONFIG.get("DATA_PATH", None), workers=args.workers,
        logger=logger, training=True, seed=args.seed, total_epochs=epochs,
        merge_all_iters_to_one_epoch=args.merge_all_iters_to_one_epoch,
        process_index=jax.process_index(), process_count=jax.process_count(),
        model_cfg=cfg.MODEL,
    )

    dataset_info = {
        "grid_size": tuple(int(x) for x in train_set.grid_size[:2]),
        "voxel_size": tuple(float(x) for x in train_set.voxel_size),
        "point_cloud_range": tuple(float(x) for x in train_set.point_cloud_range),
        "class_names": tuple(cfg.CLASS_NAMES),
    }
    model = build_network(
        cfg.MODEL, dataset_info,
        compute_dtype=jnp.bfloat16 if args.bf16 else jnp.float32,
        # measured SLOWER at the production operating point (PERF.md r2:
        # no-remat bs4 5.55 vs remat 4.89 samples/s); opt-in for
        # memory-constrained configs
        remat=bool(cfg.MODEL.get("REMAT", False)),
    )

    # sample batch for init
    sample_batch, _ = next(iter(train_loader))
    sample_batch = jax.tree.map(jnp.asarray, sample_batch)

    total_steps = len(train_loader) * epochs
    frozen = [
        n for n in cfg.MODEL.get("FREEZE_PIPELINE", [])
    ]
    from radardistill_tpu.models.detector import FREEZE_NAME_TO_SCOPE
    frozen_scopes = [s for n in frozen for s in FREEZE_NAME_TO_SCOPE.get(n, ())]

    tx, lr_sched = build_optimizer(cfg.OPTIMIZATION, None, total_steps)
    # jit_init: ONE compiled init program (persistent-cached) instead of
    # eager per-op dispatch — ~9.5 min through the axon tunnel in the r4
    # production cert, seconds warm
    state = create_train_state(model, tx, sample_batch,
                               jax.random.PRNGKey(args.seed), jit_init=True)
    # rebuild optimizer with the freeze mask now that params exist
    if frozen_scopes:
        tx, lr_sched = build_optimizer(cfg.OPTIMIZATION, state.params, total_steps, frozen_scopes)
        state = state.replace(opt_state=tx.init(state.params))

    ckpt_mgr = CheckpointManager(ckpt_dir, args.max_ckpt_save_num)
    start_epoch = 0
    start_it = 0
    if args.pretrained_model or args.ckpt:
        state = ckpt_mgr.load_params_from_file(
            state, args.ckpt or args.pretrained_model,
            pretrained_overlay=args.pretrained_model if args.ckpt else None,
        )
    elif args.init_from_teacher:
        state = ckpt_mgr.load_params_from_file(state, args.init_from_teacher)
        state = state.replace(params=duplicate_teacher_to_radar(state.params))
        logger.info("duplicated teacher weights into radar branch")
    else:
        resumed = ckpt_mgr.restore(state)
        if resumed is not None:
            state, start_epoch, resume_it = resumed
            # mid-epoch resume: `it` beyond the epoch boundary means a
            # time-interval latest save — continue within the epoch
            spe = max(len(train_loader), 1)
            start_it = min(max(resume_it - start_epoch * spe, 0), spe - 1) \
                if resume_it > start_epoch * spe else 0
            logger.info(f"resumed from epoch {start_epoch} it {resume_it} "
                        f"(mid-epoch offset {start_it})")

    mesh = make_mesh()
    repl = NamedSharding(mesh, P())
    dp = NamedSharding(mesh, P("dp"))
    state = jax.device_put(state, repl)

    # SYNC_BN True (default): global-batch BN via GSPMD (reference --sync_bn).
    # False: per-replica BN statistics via shard_map (reference DDP default) —
    # the parity-debug switch for reference-default numerics.
    sync_bn = (bool(cfg.OPTIMIZATION.get("SYNC_BN", True))
               if args.sync_bn is None else bool(args.sync_bn))
    step_fn = make_train_step(
        model, tx, cfg.MODEL, tuple(cfg.CLASS_NAMES),
        dataset_info["voxel_size"], dataset_info["point_cloud_range"],
        mesh=mesh, sync_bn=sync_bn,
    )
    if not sync_bn:
        logger.info("SYNC_BN=False: per-replica BN statistics (shard_map DDP step)")
    jstep = jax.jit(step_fn, in_shardings=(repl, dp), out_shardings=(repl, repl),
                    donate_argnums=(0,))

    def shard_fn(batch):
        return jax.tree.map(lambda v: jax.device_put(jnp.asarray(v), dp), batch)

    try:
        from tensorboardX import SummaryWriter
        tb = SummaryWriter(str(output_dir / "tensorboard")) if jax.process_index() == 0 else None
    except ImportError:
        tb = None

    # optional wandb (reference: rank-0 wandb init, tools/train.py:184-198)
    if os.environ.get("WANDB_PROJECT") and jax.process_index() == 0:
        try:
            import wandb

            wandb.init(project=os.environ["WANDB_PROJECT"], name=f"{cfg.TAG}/{args.extra_tag}",
                       config={"cfg_file": args.cfg_file})
        except ImportError:
            logger.warning("wandb not installed; skipping")

    if args.profile_dir:
        # capture a short trace of the compiled step (utils/profiler.py)
        from radardistill_tpu.utils.profiler import trace

        warm_batch = shard_fn(sample_batch)
        state, _ = jstep(state, warm_batch)  # compile outside the trace
        with trace(args.profile_dir):
            for _ in range(3):
                state, m = jstep(state, warm_batch)
            jax.block_until_ready(m["loss"])
        logger.info(f"profiler trace written to {args.profile_dir}")

    logger.info("**********************Start training**********************")
    state = train_model(
        jstep, state, train_loader, lr_sched, cfg, epochs, ckpt_dir,
        start_epoch=start_epoch, logger=logger, tb_writer=tb,
        ckpt_save_interval=args.ckpt_save_interval,
        max_ckpt_save_num=args.max_ckpt_save_num, shard_fn=shard_fn,
        start_it=start_it, log_interval=args.log_interval,
    )
    logger.info("**********************Training done**********************")

    # post-train sweep: evaluate the last N epochs' checkpoints
    # (reference tools/train.py:241-259 -> repeat_eval_ckpt with
    # start_epoch = epochs - num_epochs_to_eval)
    if args.num_epochs_to_eval > 0:
        from tools.test import eval_ckpt

        logger.info("**********************Start evaluation**********************")
        test_set, test_loader = build_dataloader(
            cfg.DATA_CONFIG, cfg.CLASS_NAMES, batch_size,
            root_path=cfg.DATA_CONFIG.get("DATA_PATH", None),
            logger=logger, training=False,
            process_index=jax.process_index(), process_count=jax.process_count(),
        )
        eval_output_dir = output_dir / "eval" / "eval_with_train"
        eval_output_dir.mkdir(parents=True, exist_ok=True)
        eval_args = argparse.Namespace(
            cal_params=False, infer_time=False, bev_similarity=None,
            sim_pooling="center",
        )
        first_eval_epoch = max(epochs - args.num_epochs_to_eval, 0)
        for e in sorted(ckpt_mgr.list_epochs()):
            if e <= first_eval_epoch:
                continue
            restored = ckpt_mgr.restore(state, epoch=e)
            if restored is None:
                continue
            st, _, _ = restored
            result = eval_ckpt(eval_args, cfg, st, model, test_set, test_loader,
                               logger, eval_output_dir, f"epoch_{e}")
            logger.info(f"eval_with_train epoch {e}: {result}")
        logger.info("**********************End evaluation**********************")


if __name__ == "__main__":
    main()
