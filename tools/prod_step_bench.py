"""Attribute the production host-loop gap (VERDICT r4 #2).

The r4 production cert (output/production_cert/cert_r4) measured ~1.0-1.5
s/iter at bs2 where the bench.py scan harness reports ~210 ms/step. This
tool splits ONE production iteration into its serial components on the real
TPU, each hard-synced with a host readback (CLAUDE.md: block_until_ready is
NOT sufficient through the axon tunnel):

  1. transfer   — shard_fn(batch) host->device, synced by reading one scalar
                  back from every leaf;
  2. compute    — jstep(state, batch) with the batch ALREADY device-resident,
                  synced by float(loss);
  3. serial     — shard_fn + jstep + float(loss), the r4 cert-loop shape;
  4. pipelined  — the r5 trainer shape: batch i+1's transfer is issued
                  before step i's loss sync (trainer.py _DevicePrefetcher).

Usage: JAX_COMPILATION_CACHE_DIR=.jax_tpu_cache python tools/prod_step_bench.py [iters]
"""

import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import numpy as np


def main():
    iters = int(sys.argv[1]) if len(sys.argv) > 1 else 8

    import jax
    import jax.numpy as jnp
    from jax.sharding import NamedSharding, PartitionSpec as P

    from radardistill_tpu.config import ConfigDict, cfg_from_yaml_file
    from radardistill_tpu.data.loader import build_dataloader
    from radardistill_tpu.models import build_network
    from radardistill_tpu.parallel.mesh import make_mesh
    from radardistill_tpu.train.optim import build_optimizer
    from radardistill_tpu.train.train_step import create_train_state, make_train_step

    cfg = ConfigDict()
    cfg_from_yaml_file(
        str(Path(__file__).parent / "cfgs/synthetic/production_cert.yaml"), cfg)
    cfg.TAG = "prod_step_bench"

    batch_size = 2
    train_set, train_loader = build_dataloader(
        cfg.DATA_CONFIG, cfg.CLASS_NAMES, batch_size, workers=2,
        training=True, seed=666, total_epochs=1, model_cfg=cfg.MODEL,
    )
    info = {
        "grid_size": tuple(int(x) for x in train_set.grid_size[:2]),
        "voxel_size": tuple(float(x) for x in train_set.voxel_size),
        "point_cloud_range": tuple(float(x) for x in train_set.point_cloud_range),
        "class_names": tuple(cfg.CLASS_NAMES),
    }
    model = build_network(cfg.MODEL, info, compute_dtype=jnp.bfloat16,
                          remat=bool(cfg.MODEL.get("REMAT", False)))

    # steady-state timing only: init VALUES don't affect TPU step time, so
    # init on the CPU backend (seconds) instead of eagerly through the
    # tunnel (~9.5 min in the r4 cert log)
    t0 = time.time()
    batches = []
    it = iter(train_loader)
    for _ in range(4):
        b, _h = next(it)
        batches.append(b)
    print(f"[{time.time()-t0:.1f}s] 4 host batches built")
    import jax

    leaves = jax.tree_util.tree_leaves_with_path(batches[0])
    leaf_bytes = {jax.tree_util.keystr(p): np.asarray(v).nbytes for p, v in leaves}
    total_mb = sum(leaf_bytes.values()) / 1e6
    print(f"batch bytes: {total_mb:.2f} MB total over {len(leaves)} leaves; top:")
    for k, v in sorted(leaf_bytes.items(), key=lambda kv: -kv[1])[:10]:
        print(f"  {k}: {v/1e6:.2f} MB")

    # steady-state timing only: TPU step time is data-independent, so build
    # the state from eval_shape with name-aware host fills instead of the
    # real init (the eager init through the tunnel took ~9.5 min in the r4
    # cert log; the real flax init can't run on the CPU backend either —
    # the graph contains Pallas kernels)
    from radardistill_tpu.utils.testing import shape_init_state

    tx, _ = build_optimizer(cfg.OPTIMIZATION, None, total_steps=100)
    jb = jax.tree.map(np.asarray, batches[0])
    state = shape_init_state(model, jb, tx)
    print(f"[{time.time()-t0:.1f}s] shape-init done")

    mesh = make_mesh()
    repl = NamedSharding(mesh, P())
    dp = NamedSharding(mesh, P("dp"))
    state = jax.device_put(jax.tree.map(np.asarray, state), repl)

    step_fn = make_train_step(
        model, tx, cfg.MODEL, info["class_names"], info["voxel_size"],
        info["point_cloud_range"], mesh=mesh, sync_bn=True,
    )
    jstep = jax.jit(step_fn, in_shardings=(repl, dp), out_shardings=(repl, repl),
                    donate_argnums=(0,))

    def shard_fn(batch):
        return jax.tree.map(lambda v: jax.device_put(jnp.asarray(v), dp), batch)

    def sync_batch(db):
        # force completion of every leaf's transfer with a host readback
        for v in jax.tree.leaves(db):
            np.asarray(jax.device_get(v.ravel()[0]))

    # warm up / compile
    db = shard_fn(batches[0])
    sync_batch(db)
    state, m = jstep(state, db)
    loss = float(m["loss"])
    print(f"[{time.time()-t0:.1f}s] compiled, warm loss={loss:.3f}")

    # 1. transfer alone
    ts = []
    for i in range(iters):
        b = batches[i % len(batches)]
        t = time.time()
        db = shard_fn(b)
        sync_batch(db)
        ts.append(time.time() - t)
    print(f"transfer: {np.median(ts)*1e3:.1f} ms median (all: "
          + " ".join(f"{x*1e3:.0f}" for x in ts) + ")")

    # 2. compute alone (batch resident)
    dbs = [shard_fn(b) for b in batches]
    for db in dbs:
        sync_batch(db)
    ts = []
    for i in range(iters):
        t = time.time()
        state, m = jstep(state, dbs[i % len(dbs)])
        _ = float(m["loss"])
        ts.append(time.time() - t)
    print(f"compute+readback: {np.median(ts)*1e3:.1f} ms median (all: "
          + " ".join(f"{x*1e3:.0f}" for x in ts) + ")")

    # 3. serial chain (the r4 cert loop at log_interval=1)
    ts = []
    for i in range(iters):
        b = batches[i % len(batches)]
        t = time.time()
        db = shard_fn(b)
        state, m = jstep(state, db)
        _ = float(m["loss"])
        ts.append(time.time() - t)
    print(f"serial chain: {np.median(ts)*1e3:.1f} ms median (all: "
          + " ".join(f"{x*1e3:.0f}" for x in ts) + ")")

    # 2b. one-blob transfer: separates per-leaf tunnel overhead from raw
    # bandwidth — same total bytes, ONE device_put
    blob_parts = [
        np.ascontiguousarray(np.asarray(v)).reshape(batch_size, -1).view(np.uint8)
        for v in jax.tree.leaves(batches[0])
        if np.asarray(v).ndim and np.asarray(v).shape[0] == batch_size
    ]
    blob = np.concatenate(blob_parts, axis=1)
    print(f"blob: {blob.nbytes/1e6:.2f} MB as one (B, K) u8 array")
    ts = []
    for i in range(iters):
        t = time.time()
        db = jax.device_put(blob, dp)
        np.asarray(jax.device_get(db.ravel()[0]))
        ts.append(time.time() - t)
        del db
    print(f"one-blob transfer: {np.median(ts)*1e3:.1f} ms median (all: "
          + " ".join(f"{x*1e3:.0f}" for x in ts) + ")")

    # 2c. threaded transfer overlapping compute: does the tunnel overlap a
    # background device_put with a running step? (trainer._DevicePrefetcher)
    import queue as _q
    import threading as _th

    qq = _q.Queue(maxsize=2)

    def _feeder(n):
        for i in range(n):
            qq.put(shard_fn(batches[i % len(batches)]))
        qq.put(None)

    th = _th.Thread(target=_feeder, args=(iters,), daemon=True)
    th.start()
    ts = []
    pending = None
    while True:
        t = time.time()
        db = qq.get()
        if db is None:
            break
        state, m = jstep(state, db)
        if pending is not None:
            _ = float(pending["loss"])
        pending = m
        ts.append(time.time() - t)
    _ = float(pending["loss"])
    th.join()
    print(f"threaded prefetch (lag-1 sync): {np.median(ts)*1e3:.1f} ms median (all: "
          + " ".join(f"{x*1e3:.0f}" for x in ts) + ")")

    # 4. pipelined: issue batch i+1's device_put before syncing loss i
    ts = []
    db = shard_fn(batches[0])
    pending = None
    for i in range(iters):
        t = time.time()
        state, m = jstep(state, db)
        db = shard_fn(batches[(i + 1) % len(batches)])  # overlap next transfer
        if pending is not None:
            _ = float(pending["loss"])  # lag-1 metric sync
        pending = m
        ts.append(time.time() - t)
    _ = float(pending["loss"])
    print(f"pipelined (lag-1 sync): {np.median(ts)*1e3:.1f} ms median (all: "
          + " ".join(f"{x*1e3:.0f}" for x in ts) + ")")

    print("done")


if __name__ == "__main__":
    main()
