"""Bisect the train step: time (a) forward+loss only and (b) grad without
optimizer, against the known full step (~1 s at bs2, grid 1440) — all as
in-device scan loops (tunnel tax amortized; see CLAUDE.md).

Usage: python tools/fwd_bench.py [mode] — mode in {fwd, grad, all}
"""

import os
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import numpy as np


def main():
    import jax
    import jax.numpy as jnp

    jax.config.update(
        "jax_compilation_cache_dir",
        str(Path(__file__).resolve().parent.parent / ".jax_tpu_cache"),
    )

    from radardistill_tpu.config import ConfigDict
    from radardistill_tpu.data.collate import collate_batch
    from radardistill_tpu.data.synthetic import make_scene
    from radardistill_tpu.models import build_network, compute_training_loss
    from radardistill_tpu.train.optim import build_optimizer
    from radardistill_tpu.train.train_step import create_train_state
    from radardistill_tpu.utils.production import production_cfg
    from radardistill_tpu.utils.testing import CLASS_NAMES, apply_bench_backbone_env

    mode = sys.argv[1] if len(sys.argv) > 1 else "all"
    grid, bs = 1440, 2
    full, info = production_cfg(grid=grid)
    cfg = full.MODEL
    apply_bench_backbone_env(cfg)  # same DEV-ONLY BENCH_* knobs as bench.py
    model = build_network(cfg, info, compute_dtype=jnp.bfloat16, remat=True)
    caps = {"MAX_LIDAR_POINTS": 160_000, "MAX_RADAR_POINTS": 4096, "NUM_MAX_OBJS": 500}
    samples = [make_scene(i, num_lidar=160_000, num_radar=3000, num_boxes=60,
                          pc_range=info["point_cloud_range"]) for i in range(bs)]
    b = collate_batch(samples, caps)
    b.pop("_host", None)
    batch = {k: jnp.asarray(v) for k, v in b.items()}
    optim_cfg = ConfigDict(OPTIMIZER="adam_onecycle", LR=1e-3, WEIGHT_DECAY=0.01,
                           MOMS=[0.95, 0.85], PCT_START=0.4, DIV_FACTOR=10, GRAD_NORM_CLIP=10)
    tx, _ = build_optimizer(optim_cfg, None, total_steps=1000)
    state = create_train_state(model, tx, batch)

    def loss_fn(params, batch_stats, batch):
        out, mutated = model.apply(
            {"params": params, "batch_stats": batch_stats}, batch, True,
            mutable=["batch_stats"],
        )
        loss, _ = compute_training_loss(
            cfg, out, CLASS_NAMES, info["voxel_size"], info["point_cloud_range"]
        )
        return loss

    LOOP = 4

    def timed(jfn, *args, n=3):
        float(jfn(*args))
        ts = []
        for _ in range(n):
            t0 = time.perf_counter()
            float(jfn(*args))
            ts.append(time.perf_counter() - t0)
        return float(np.median(ts)) * 1e3 / LOOP

    if mode in ("fwd", "all"):
        @jax.jit
        def fwd_loop(params, batch_stats, batch):
            acc, _ = jax.lax.scan(
                lambda a, _: (a * 0.5 + loss_fn(params, batch_stats, batch), None),
                jnp.float32(0), None, length=LOOP)
            return acc

        print(f"fwd+loss:      {timed(fwd_loop, state.params, state.batch_stats, batch):8.1f} ms")

    if mode in ("grad", "all"):
        @jax.jit
        def grad_loop(params, batch_stats, batch):
            def body(a, _):
                g = jax.grad(loss_fn)(params, batch_stats, batch)
                # consume EVERY grad leaf or XLA dead-code-eliminates the
                # unused parts of the backward pass
                s = sum(jnp.sum(l.astype(jnp.float32)) for l in jax.tree.leaves(g))
                return a * 0.5 + s, None
            acc, _ = jax.lax.scan(body, jnp.float32(0), None, length=LOOP)
            return acc

        print(f"fwd+bwd (no opt): {timed(grad_loop, state.params, state.batch_stats, batch):8.1f} ms")


if __name__ == "__main__":
    main()
