"""Evaluation entry point (L7).

Reference: tools/test.py (single-ckpt eval :413-448 and --eval_all watcher
:451-506 polling the ckpt dir against a result record; --infer_time latency
meter).
"""

import argparse
import datetime
import re
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import numpy as np


def parse_config():
    parser = argparse.ArgumentParser()
    parser.add_argument("--cfg_file", type=str, required=True)
    parser.add_argument("--batch_size", type=int, default=None)
    parser.add_argument("--extra_tag", type=str, default="default")
    parser.add_argument("--ckpt", type=str, default=None)
    parser.add_argument("--ckpt_dir", type=str, default=None)
    parser.add_argument("--eval_all", action="store_true")
    parser.add_argument("--eval_tag", type=str, default="default")
    parser.add_argument("--max_waiting_mins", type=float, default=30)
    parser.add_argument("--infer_time", action="store_true")
    parser.add_argument("--cal_params", action="store_true",
                        help="report exact FLOPs/bytes from XLA cost analysis (thop equivalent)")
    parser.add_argument("--platform", type=str, default=None)
    parser.add_argument("--bev_similarity", type=str, default=None,
                        help="comma-separated output-dict key paths to run class-similarity "
                             "analytics over (e.g. spatial_features_2d,radar_spatial_features_2d)")
    parser.add_argument("--sim_pooling", type=str, default="center",
                        choices=["center", "avg", "max"])
    parser.add_argument("--set", dest="set_cfgs", default=None, nargs=argparse.REMAINDER)
    args = parser.parse_args()

    from radardistill_tpu.config import ConfigDict, cfg_from_list, cfg_from_yaml_file

    cfg = ConfigDict()
    cfg_from_yaml_file(args.cfg_file, cfg)
    cfg.TAG = Path(args.cfg_file).stem
    if args.set_cfgs is not None:
        cfg_from_list(args.set_cfgs, cfg)
    return args, cfg


def repeat_eval_ckpt(ckpt_mgr, record_file, max_waiting_mins, restore_fn,
                     eval_fn, logger, sleep=time.sleep, clock=time.time,
                     poll_interval=30.0):
    """--eval_all watcher (reference tools/test.py:451-506): poll the ckpt
    dir, skip epochs already listed in the record file, evaluate new arrivals
    in epoch order (appending each to the record), tolerate unloadable
    checkpoints (restore_fn -> None), and exit once nothing new has arrived
    for max_waiting_mins. `sleep`/`clock` are injectable for tests
    (tests/test_eval_all_watcher.py)."""
    record_file = Path(record_file)
    evaluated = set()
    if record_file.exists():
        evaluated = set(int(x) for x in record_file.read_text().split())
    wait_start = clock()
    while True:
        todo = [e for e in ckpt_mgr.list_epochs() if e not in evaluated]
        progressed = False
        for e in sorted(todo):
            restored = restore_fn(e)
            if restored is None:
                continue  # mid-write/corrupt ckpt: retried next poll
            result = eval_fn(e, restored)
            logger.info(f"epoch {e}: {result}")
            evaluated.add(e)
            with open(record_file, "a") as f:
                f.write(f"{e}\n")
            progressed = True
        if progressed:
            # reference resets the wait budget only when a ckpt was actually
            # evaluated (total_time=0, tools/test.py:483)
            wait_start = clock()
        else:
            if clock() - wait_start > max_waiting_mins * 60:
                break
            sleep(poll_interval)
    return evaluated


def eval_ckpt(args, cfg, state, model, test_set, test_loader, logger, output_dir, epoch_tag):
    import jax

    from radardistill_tpu.train.eval_utils import eval_one_epoch
    from radardistill_tpu.train.train_step import make_eval_step

    eval_step = jax.jit(make_eval_step(model))

    if args.cal_params:
        from radardistill_tpu.utils.profiler import cost_analysis
        import jax.numpy as jnp

        b0, _ = next(iter(test_loader))
        b0 = {k: jnp.asarray(v) for k, v in b0.items()}
        ca = cost_analysis(make_eval_step(model), state.params, state.batch_stats, b0)
        n_params = sum(np.prod(x.shape) for x in jax.tree.leaves(state.params))
        logger.info(f"params: {n_params/1e6:.2f}M  flops/batch: {ca['flops']/1e9:.1f} G  "
                    f"bytes: {ca['bytes_accessed']/1e9:.2f} G")

    def loader_iter():
        import jax.numpy as jnp
        for batch, host in test_loader:
            yield {k: jnp.asarray(v) for k, v in batch.items()}, host

    engines = []
    if args.bev_similarity:
        from radardistill_tpu.utils.similarity import BEVSimilarityEngine
        pcr = [float(x) for x in test_set.point_cloud_range]
        for key_path in args.bev_similarity.split(","):
            engines.append(BEVSimilarityEngine(
                key_path.replace(".", "_"), key_path, cfg.CLASS_NAMES, pcr,
                pooling=args.sim_pooling,
            ))

    det_annos, recall_dict, timing = eval_one_epoch(
        eval_step, state.params, state.batch_stats,
        loader_iter(), test_set, logger,
        thresh_list=cfg.MODEL.POST_PROCESSING.RECALL_THRESH_LIST,
        infer_time=args.infer_time,
        similarity_engines=engines,
    )
    for eng in engines:
        out_dir = eng.save(output_dir)
        logger.info(f"similarity analytics [{eng.feature_name}] -> {out_dir}")
    if args.infer_time and timing["p50_ms"]:
        logger.info(f"inference p50: {timing['p50_ms']:.1f} ms/batch")
    from radardistill_tpu.parallel.multihost import gather_detections

    det_annos = gather_detections(det_annos)
    # persist raw detections (+GT when available) for tools/app.py and
    # offline analysis — reference eval_utils.py result.pkl dump
    import jax as _jax
    import pickle

    eval_dir = output_dir / f"eval_{epoch_tag}"
    eval_dir.mkdir(parents=True, exist_ok=True)
    if _jax.process_index() == 0:
        with open(eval_dir / "result.pkl", "wb") as f:
            pickle.dump(det_annos, f)
        infos = getattr(test_set, "infos", None)
        if infos and "gt_boxes" in (infos[0] or {}):
            gt_list = [
                {"gt_boxes": i.get("gt_boxes"), "gt_names": i.get("gt_names"),
                 "frame_id": i.get("token", i.get("frame_id"))}
                for i in infos
            ]
            with open(eval_dir / "gt_annos_list.pkl", "wb") as f:
                pickle.dump(gt_list, f)
    result_str, result_dict = test_set.evaluation(
        det_annos, cfg.CLASS_NAMES, output_path=str(eval_dir)
    )
    logger.info(result_str)
    return result_dict


def main():
    args, cfg = parse_config()
    if args.platform:
        import jax
        jax.config.update("jax_platforms", args.platform)
    import jax
    import jax.numpy as jnp

    from radardistill_tpu.data.loader import build_dataloader
    from radardistill_tpu.models import build_network
    from radardistill_tpu.train.checkpoint import CheckpointManager
    from radardistill_tpu.train.optim import build_optimizer
    from radardistill_tpu.train.train_step import create_train_state
    from radardistill_tpu.utils.common import create_logger, maybe_init_distributed
    from radardistill_tpu.config import ConfigDict

    maybe_init_distributed()

    output_dir = Path("output") / cfg.TAG / args.extra_tag / "eval"
    output_dir.mkdir(parents=True, exist_ok=True)
    logger = create_logger(
        output_dir / f"log_eval_{datetime.datetime.now():%Y%m%d-%H%M%S}.txt",
        rank=jax.process_index(),
    )

    batch_size = args.batch_size or cfg.OPTIMIZATION.get("BATCH_SIZE_PER_GPU", 1)
    # per-process dataset slice (DistributedSampler equivalent; detections
    # are merged back by gather_detections after the loop)
    test_set, test_loader = build_dataloader(
        cfg.DATA_CONFIG, cfg.CLASS_NAMES, batch_size,
        root_path=cfg.DATA_CONFIG.get("DATA_PATH", None),
        logger=logger, training=False,
        process_index=jax.process_index(), process_count=jax.process_count(),
    )
    dataset_info = {
        "grid_size": tuple(int(x) for x in test_set.grid_size[:2]),
        "voxel_size": tuple(float(x) for x in test_set.voxel_size),
        "point_cloud_range": tuple(float(x) for x in test_set.point_cloud_range),
        "class_names": tuple(cfg.CLASS_NAMES),
    }
    model = build_network(cfg.MODEL, dataset_info, compute_dtype=jnp.bfloat16)

    sample_batch, _ = next(iter(test_loader))
    sample_batch = {k: jnp.asarray(v) for k, v in sample_batch.items()}
    tx, _ = build_optimizer(
        cfg.OPTIMIZATION if "OPTIMIZATION" in cfg else ConfigDict(OPTIMIZER="adam", LR=1e-3),
        None, total_steps=1,
    )
    state = create_train_state(model, tx, sample_batch)

    ckpt_mgr = CheckpointManager(args.ckpt_dir or output_dir.parent / "ckpt")

    if args.eval_all:
        def restore_fn(e):
            restored = ckpt_mgr.restore(state, epoch=e)
            return restored[0] if restored is not None else None

        def eval_fn(e, st):
            return eval_ckpt(args, cfg, st, model, test_set, test_loader,
                             logger, output_dir, f"epoch_{e}")

        repeat_eval_ckpt(
            ckpt_mgr, output_dir / f"eval_list_{args.eval_tag}.txt",
            args.max_waiting_mins, restore_fn, eval_fn, logger,
        )
    else:
        if args.ckpt:
            state = ckpt_mgr.load_params_from_file(state, args.ckpt)
            tag = Path(args.ckpt).name
        else:
            restored = ckpt_mgr.restore(state)
            assert restored is not None, "no checkpoint found"
            state, e, _ = restored
            tag = f"epoch_{e}"
        eval_ckpt(args, cfg, state, model, test_set, test_loader, logger, output_dir, tag)


if __name__ == "__main__":
    main()
