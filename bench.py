"""Headline bench: full RadarDistill distillation train step throughput on
one chip (teacher fwd + student fwd + CMA/AFD/PFD + head losses + AdamW),
full 1440² nuScenes grid.

Baseline context (BASELINE.md): the reference publishes no throughput. A
PillarNet-scale OpenPCDet distill step at batch 8 runs ~1 it/s on an A100
(~8 samples/s/chip); the driver target is >=2x A100/chip => 16 samples/s.
vs_baseline reported against that 16 samples/s target.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.
"""

import json
import os
import time

os.environ.setdefault("XLA_PYTHON_CLIENT_MEM_FRACTION", "0.92")


def _enable_compile_cache():
    """Remote (axon) compiles of the full train step take ~20 min cold; the
    persistent cache makes driver re-runs fast on this machine. (jax is
    already imported by sitecustomize, so set via config, not env.)"""
    import jax

    jax.config.update(
        "jax_compilation_cache_dir",
        os.path.join(os.path.dirname(os.path.abspath(__file__)), ".jax_tpu_cache"),
    )
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

import numpy as np  # noqa: E402


A100_X2_TARGET = 16.0  # samples/s/chip


def infer_bench():
    """Secondary metric: radar-only e2e inference latency (BASELINE.md row
    'Inference latency'). BENCH_MODE=infer."""
    import jax
    import jax.numpy as jnp

    from radardistill_tpu.data.collate import collate_batch
    from radardistill_tpu.data.synthetic import make_scene
    from radardistill_tpu.models import build_network
    from radardistill_tpu.utils.production import VAL_YAML, production_cfg
    from radardistill_tpu.utils.testing import apply_bench_backbone_env

    # the SHIPPED eval yaml is the single source of truth (radar-only eval
    # formulation, reference radar_distill_val.yaml); BENCH_GRID is dev-only
    grid = int(os.environ.get("BENCH_GRID", 1440))
    full, info = production_cfg(VAL_YAML, grid=grid)
    cfg = full.MODEL
    apply_bench_backbone_env(cfg)  # no-op unless BENCH_* knobs explicitly set
    model = build_network(cfg, info, compute_dtype=jnp.bfloat16)
    s = make_scene(0, num_lidar=100, num_radar=3000, num_boxes=40,
                   pc_range=info["point_cloud_range"])
    del s["points"]
    b = collate_batch([s], {"MAX_RADAR_POINTS": 8192, "NUM_MAX_OBJS": 500})
    b.pop("_host", None)
    if os.environ.get("BENCH_HOSTPRE", "1") != "0":
        from radardistill_tpu.data.host_precompute import HostPrecompute

        b = HostPrecompute(cfg, info["grid_size"], info["voxel_size"],
                           info["point_cloud_range"])(b)
    batch = jax.tree.map(jnp.asarray, b)
    variables = model.init(jax.random.PRNGKey(0), batch, False)

    @jax.jit
    def fwd(variables, batch):
        return model.apply(variables, batch, False)["final_box_dicts"]

    out = fwd(variables, batch)
    _ = float(out["scores"].sum())
    times = []
    for _ in range(20):
        t0 = time.perf_counter()
        out = fwd(variables, batch)
        _ = float(out["scores"].sum())  # real sync (axon quirk)
        times.append(time.perf_counter() - t0)
    p50 = float(np.median(times) * 1e3)

    # BENCH_SCAN=k>1: k forwards inside ONE device program — the device-only
    # latency with the ~30-60 ms tunnel round-trip amortized away. The scan
    # carry perturbs the input by a numerically-negligible amount so XLA
    # cannot hoist the loop-invariant body (CLAUDE.md trap (a)).
    scan_k = int(os.environ.get("BENCH_SCAN", "1"))
    device_ms = None
    if scan_k > 1:
        rp = batch["radar_points"]

        def multi(variables, batch):
            def body(carry, _):
                b = dict(batch)
                b["radar_points"] = batch["radar_points"] + carry
                o = model.apply(variables, b, False)["final_box_dicts"]
                s = o["scores"].sum()
                return (s * 1e-30).astype(rp.dtype), s
            _, sums = jax.lax.scan(
                body, jnp.zeros((), rp.dtype), None, length=scan_k)
            return sums

        jmulti = jax.jit(multi)
        _ = float(jmulti(variables, batch).sum())
        prof_dir = os.environ.get("BENCH_PROFILE")
        if prof_dir:
            import jax.profiler
            with jax.profiler.trace(prof_dir, create_perfetto_trace=True):
                _ = float(jmulti(variables, batch).sum())
        ts = []
        for _ in range(5):
            t0 = time.perf_counter()
            _ = float(jmulti(variables, batch).sum())
            ts.append(time.perf_counter() - t0)
        device_ms = float(np.median(ts) * 1e3 / scan_k)

    rec = {
        "metric": "radar_infer_p50_ms",
        "value": round(p50, 2),
        "unit": "ms",
        "vs_baseline": round(50.0 / p50, 3),  # vs ~50ms typical GPU e2e
    }
    if device_ms is not None:
        rec["device_only_ms"] = round(device_ms, 2)
    print(json.dumps(rec))


def main():
    _enable_compile_cache()
    if os.environ.get("BENCH_PLATFORM"):
        # dev-only: run the bench graph on CPU (tiny BENCH_GRID) — the env
        # var route is dead because sitecustomize pins JAX_PLATFORMS=axon
        import jax
        jax.config.update("jax_platforms", os.environ["BENCH_PLATFORM"])
    if os.environ.get("BENCH_MODE") == "infer":
        return infer_bench()
    import jax
    import jax.numpy as jnp

    from radardistill_tpu.data.collate import collate_batch
    from radardistill_tpu.data.synthetic import make_scene
    from radardistill_tpu.models import build_network
    from radardistill_tpu.train.optim import build_optimizer
    from radardistill_tpu.train.train_step import create_train_state, make_train_step
    from radardistill_tpu.utils.production import production_cfg
    from radardistill_tpu.utils.testing import CLASS_NAMES, apply_bench_backbone_env

    # bs2 + no-remat is the measured best operating point after the pallas
    # expand kernel (PERF.md r2: 6.73 vs 6.67 bs4; bs6/bs8 hit HBM faults).
    # Matches production: tools/train.py builds without remat.
    grid = int(os.environ.get("BENCH_GRID", 1440))
    batch_size = int(os.environ.get("BENCH_BS", 2))
    steps = int(os.environ.get("BENCH_STEPS", 10))

    # the SHIPPED training yaml is the single source of truth for the
    # benchmarked formulation (VERDICT r2 weak #2): S2D teacher + AS radar
    # live in radar_distill_train.yaml itself, not in bench-only env knobs.
    full, info = production_cfg(grid=grid)
    cfg = full.MODEL
    apply_bench_backbone_env(cfg)  # no-op unless BENCH_* knobs explicitly set
    model = build_network(
        cfg, info, compute_dtype=jnp.bfloat16,
        remat=os.environ.get("BENCH_REMAT", "0") == "1",
    )

    caps = {
        "MAX_LIDAR_POINTS": int(os.environ.get("BENCH_LIDAR_PTS", 160_000)),
        "MAX_RADAR_POINTS": 4096,
        "NUM_MAX_OBJS": 500,
    }
    samples = [
        make_scene(i, num_lidar=caps["MAX_LIDAR_POINTS"], num_radar=3000,
                   num_boxes=60, pc_range=info["point_cloud_range"])
        for i in range(batch_size)
    ]
    b = collate_batch(samples, caps)
    b.pop("_host", None)
    # host precompute (sorted points + pillar tables + AS rulebooks) exactly
    # as the production loader ships them (data/host_precompute.py; built on
    # the prefetch thread there, outside the timed loop here — same overlap)
    if os.environ.get("BENCH_HOSTPRE", "1") != "0":
        from radardistill_tpu.data.host_precompute import HostPrecompute

        b = HostPrecompute(cfg, info["grid_size"], info["voxel_size"],
                           info["point_cloud_range"])(b)
    batch = jax.tree.map(jnp.asarray, b)

    tx, _ = build_optimizer(full.OPTIMIZATION, None, total_steps=1000)
    state = create_train_state(model, tx, batch)
    # rebuild with the freeze mask exactly like tools/train.py:134-139 —
    # the production optimizer carries NO Adam moments for the frozen
    # teacher scopes (optax.masked); benching the unmasked chain would pay
    # moment/decay HBM traffic per step that production never does
    from radardistill_tpu.models.detector import FREEZE_NAME_TO_SCOPE
    frozen_scopes = [s for n in cfg.get("FREEZE_PIPELINE", [])
                     for s in FREEZE_NAME_TO_SCOPE.get(n, ())]
    if frozen_scopes:
        tx, _ = build_optimizer(full.OPTIMIZATION, state.params, 1000,
                                frozen_scopes)
        state = state.replace(opt_state=tx.init(state.params))
    step_fn = make_train_step(model, tx, cfg, CLASS_NAMES, info["voxel_size"],
                              info["point_cloud_range"])

    # BENCH_PROFILE=<dir> captures a device trace of one timed call
    # BENCH_SCAN=k runs k steps inside ONE device program (lax.scan),
    # amortizing the tunnel's per-call round-trip tax (~30-60 ms, see
    # CLAUDE.md) — the defensible estimate of true per-step device time.
    scan_k = int(os.environ.get("BENCH_SCAN", "4"))
    # BENCH_UNROLL=1 fully unrolls the k steps into straight-line code: the
    # while-loop carry forces one layout on every state leaf and XLA inserts
    # per-iteration boundary copies (~13-20 ms/step in the r3 trace) that the
    # production host loop never pays; unrolling removes the while op at the
    # cost of a k-times-larger (cached) compile.
    # BENCH_UNROLL=1 -> full unroll (r5: killed the remote compile helper,
    # compiler OOM); BENCH_UNROLL=k>1 -> partial unroll factor k (halves the
    # boundary-copy count at 2 for a 2x, not 4x, program)
    _u = os.environ.get("BENCH_UNROLL", "0")
    unroll_k = scan_k if _u == "1" else max(1, min(scan_k, int(_u)))
    if scan_k > 1:
        # Force per-iteration recompute of every batch-dependent subgraph:
        # with the production (masked) optimizer the frozen teacher's params
        # come out of apply_updates bit-identical (p + 0 simplifies to p), so
        # the teacher forward and target assignment are loop-INVARIANT w.r.t.
        # the scan carry and XLA hoists them out of the while loop — the
        # harness then skips ~70 ms/step of work production pays on every
        # fresh batch (CLAUDE.md trap (a), here at subgraph granularity: it
        # inflated the first masked-optimizer measurement to 10.2 samples/s).
        # A carry-derived ~1e-28 perturbation of the float inputs is far
        # below the data's f32 resolution (the adds round to identical bits
        # at runtime — same math, same measurement) but makes the teacher
        # subgraph loop-variant. Same trick as infer_bench's scan.
        def perturbed(b, eps):
            out = dict(b)
            for key in ("points", "radar_points", "gt_boxes"):
                if key in out:
                    out[key] = out[key] + eps.astype(out[key].dtype)
            return out

        def multi_step(state, batch):
            def body(carry, _):
                s, eps = carry
                s2, m = step_fn(s, perturbed(batch, eps))
                return (s2, m["loss"] * 1e-30), m["loss"]
            (state, _), losses = jax.lax.scan(
                body, (state, jnp.zeros((), jnp.float32)), None,
                length=scan_k, unroll=unroll_k)
            return state, {"loss": losses[-1]}

        step = jax.jit(multi_step, donate_argnums=(0,))
    else:
        step = jax.jit(step_fn, donate_argnums=(0,))

    state, m = step(state, batch)  # compile + 1 step
    jax.block_until_ready(m["loss"])

    prof_dir = os.environ.get("BENCH_PROFILE")
    if prof_dir:
        import jax.profiler
        with jax.profiler.trace(prof_dir, create_perfetto_trace=True):
            state, m = step(state, batch)
            _ = float(m["loss"])

    # per-step hard sync via host readback: on the axon tunnel,
    # block_until_ready does NOT synchronize — float() does (CLAUDE.md)
    times = []
    for _ in range(steps):
        t0 = time.perf_counter()
        state, m = step(state, batch)
        _ = float(m["loss"])
        times.append(time.perf_counter() - t0)
    dt = float(np.median(times))

    sps = batch_size * scan_k / dt
    print(json.dumps({
        "metric": "distill_train_samples_per_sec_per_chip",
        "value": round(sps, 3),
        "unit": "samples/s",
        "vs_baseline": round(sps / A100_X2_TARGET, 3),
    }))


if __name__ == "__main__":
    main()
