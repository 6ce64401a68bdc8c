"""AOT memory analysis of the production distill train step (no execution).

Root-causes the batch-size HBM ceiling (VERDICT r2 #4): compiles the exact
bench.py/train.py step at a given batch size and prints XLA's memory
analysis — argument/output/temp/peak bytes — without allocating or running.
Usage:
    JAX_COMPILATION_CACHE_DIR=.jax_tpu_cache python tools/mem_analysis.py [bs ...]
Env: BENCH_GRID, BENCH_REMAT, BENCH_INT8 — same knobs as bench.py.
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def analyze(batch_size: int, grid: int) -> None:
    import jax
    import jax.numpy as jnp

    from radardistill_tpu.data.collate import collate_batch
    from radardistill_tpu.data.synthetic import make_scene
    from radardistill_tpu.models import build_network
    from radardistill_tpu.train.optim import build_optimizer
    from radardistill_tpu.train.train_step import (create_train_state,
                                                   make_train_step)
    from radardistill_tpu.utils.production import production_cfg
    from radardistill_tpu.utils.testing import (CLASS_NAMES,
                                                apply_bench_backbone_env)

    full, info = production_cfg(grid=grid)
    cfg = full.MODEL
    apply_bench_backbone_env(cfg)
    model = build_network(
        cfg, info, compute_dtype=jnp.bfloat16,
        remat=os.environ.get("BENCH_REMAT", "0") == "1",
    )
    caps = {"MAX_LIDAR_POINTS": int(os.environ.get("BENCH_LIDAR_PTS", 160_000)),
            "MAX_RADAR_POINTS": 4096, "NUM_MAX_OBJS": 500}
    samples = [
        make_scene(i, num_lidar=caps["MAX_LIDAR_POINTS"], num_radar=3000,
                   num_boxes=60, pc_range=info["point_cloud_range"])
        for i in range(batch_size)
    ]
    b = collate_batch(samples, caps)
    b.pop("_host", None)
    batch = {k: jnp.asarray(v) for k, v in b.items()}
    tx, _ = build_optimizer(full.OPTIMIZATION, None, total_steps=1000)
    state = create_train_state(model, tx, batch)
    step_fn = make_train_step(model, tx, cfg, CLASS_NAMES, info["voxel_size"],
                              info["point_cloud_range"])
    compiled = (jax.jit(step_fn, donate_argnums=(0,))
                .lower(state, batch).compile())
    ma = compiled.memory_analysis()
    gb = 1 / (1 << 30)
    print(f"bs{batch_size} grid{grid}: "
          f"args {ma.argument_size_in_bytes * gb:.2f} GiB, "
          f"out {ma.output_size_in_bytes * gb:.2f} GiB, "
          f"temp {ma.temp_size_in_bytes * gb:.2f} GiB, "
          f"alias {ma.alias_size_in_bytes * gb:.2f} GiB, "
          f"peak(args+out+temp-alias) "
          f"{(ma.argument_size_in_bytes + ma.output_size_in_bytes + ma.temp_size_in_bytes - ma.alias_size_in_bytes) * gb:.2f} GiB")


def main():
    grid = int(os.environ.get("BENCH_GRID", 1440))
    sizes = [int(a) for a in sys.argv[1:]] or [2, 4, 6, 8]
    for bs in sizes:
        analyze(bs, grid)


if __name__ == "__main__":
    main()
