"""Quality gate for the static-int8 frozen teacher (VERDICT r2 #2).

Protocol (the int8 path only activates for a FROZEN teacher, so plain
overfit_check — which unfreezes everything — never exercises it):

  Phase A: jointly overfit the full distill graph (float, S2D teacher) on
           one synthetic scene — produces a TRAINED teacher whose BN
           running statistics describe the data (the premise of the
           analytic int8 bounds).
  Phase B: freeze the teacher, reset the optimizer, and distill the radar
           branch for N more steps TWICE from the identical state — once
           against the f32 teacher, once against the int8-static teacher
           (BACKBONE_3D.INT8: static). Compare final student mAP and the
           distill-loss trajectories.

Usage: JAX_COMPILATION_CACHE_DIR=.jax_tpu_cache python tools/int8_quality.py [steps_a] [steps_b] [grid] [int8_stages]
"""

import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import numpy as np


def main():
    steps_a = int(sys.argv[1]) if len(sys.argv) > 1 else 400
    steps_b = int(sys.argv[2]) if len(sys.argv) > 2 else 300
    grid = int(sys.argv[3]) if len(sys.argv) > 3 else 256
    int8_stages = int(sys.argv[4]) if len(sys.argv) > 4 else 1

    import jax
    import jax.numpy as jnp

    from radardistill_tpu.config import ConfigDict
    from radardistill_tpu.data.collate import collate_batch
    from radardistill_tpu.data.synthetic import make_scene
    from radardistill_tpu.data.nuscenes.eval_bridge import center_distance_ap
    from radardistill_tpu.models import build_network
    from radardistill_tpu.models.detector import FREEZE_NAME_TO_SCOPE
    from radardistill_tpu.train.optim import build_optimizer
    from radardistill_tpu.train.train_step import (create_train_state,
                                                   make_eval_step,
                                                   make_train_step)
    from radardistill_tpu.utils.testing import CLASS_NAMES, make_model_cfg

    cfg, info = make_model_cfg(grid=grid, num_max_objs=64, k_per_head=128,
                               nms_post=32)
    cfg.BACKBONE_3D.NAME = "PillarRes18BackBone8x_S2D"
    teacher_freeze = list(cfg.FREEZE_PIPELINE)
    cfg.FREEZE_PIPELINE = []

    caps = {"MAX_LIDAR_POINTS": 8192, "MAX_RADAR_POINTS": 1024,
            "NUM_MAX_OBJS": 64}
    scene = make_scene(0, num_lidar=6000, num_radar=900, num_boxes=8,
                       pc_range=info["point_cloud_range"])
    b = collate_batch([scene], caps)
    b.pop("_host", None)
    batch = {k: jnp.asarray(v) for k, v in b.items()}

    optim_cfg = ConfigDict(
        OPTIMIZER="adam_onecycle", LR=1e-3, WEIGHT_DECAY=0.01,
        MOMS=[0.95, 0.85], PCT_START=0.4, DIV_FACTOR=10, GRAD_NORM_CLIP=10,
    )

    def run(model, model_cfg, state, tx, n, tag):
        step = jax.jit(
            make_train_step(model, tx, model_cfg, CLASS_NAMES,
                            info["voxel_size"], info["point_cloud_range"]),
            donate_argnums=(0,))
        t0, first, last = time.time(), None, None
        for i in range(n):
            state, m = step(state, batch)
            if i % 50 == 0 or i == n - 1:
                last = float(m["loss"])
                first = last if first is None else first
                print(f"[{tag}] step {i}: loss {last:.3f} "
                      f"({time.time() - t0:.0f}s)", flush=True)
        return state, first, last

    def ap_of(model, state):
        ev = jax.jit(make_eval_step(model))
        out = ev(state.params, state.batch_stats, batch)
        fb = jax.tree.map(np.asarray, out["final_box_dicts"])
        v = fb["valid"][0]
        det_names = np.array(
            [CLASS_NAMES[int(l) - 1] for l in fb["labels"][0][v]])
        gt_names = np.array(
            [CLASS_NAMES[int(c) - 1] for c in scene["gt_boxes"][:, 9]])
        aps = center_distance_ap(
            [scene["gt_boxes"]], [gt_names], [fb["boxes"][0][v]],
            [fb["scores"][0][v]], [det_names], CLASS_NAMES)
        vals = [np.mean(list(x.values())) for x in aps.values()]
        return float(np.mean(vals)) if vals else 0.0

    # ---- phase A: joint overfit, float
    model_a = build_network(cfg, info, compute_dtype=jnp.bfloat16)
    tx_a, _ = build_optimizer(optim_cfg, None, total_steps=steps_a)
    state_a = create_train_state(model_a, tx_a, batch)
    state_a, l0, lA = run(model_a, cfg, state_a, tx_a, steps_a, "A joint")
    print(f"phase A: loss {l0:.1f} -> {lA:.2f}")

    # ---- phase B: frozen teacher, radar distill, f32 vs int8-static
    frozen_scopes = [s for n_ in teacher_freeze
                     for s in FREEZE_NAME_TO_SCOPE.get(n_, ())]
    results = {}
    for mode in ("f32", "int8"):
        cfg_b = ConfigDict(cfg)
        cfg_b.FREEZE_PIPELINE = teacher_freeze
        cfg_b.BACKBONE_3D = ConfigDict(cfg.BACKBONE_3D)
        if mode == "int8":
            cfg_b.BACKBONE_3D.INT8 = "static"
            cfg_b.BACKBONE_3D.INT8_STAGES = int8_stages
        model_b = build_network(cfg_b, info, compute_dtype=jnp.bfloat16)
        tx_b, _ = build_optimizer(optim_cfg, state_a.params,
                                  total_steps=steps_b,
                                  frozen_scopes=frozen_scopes)
        # fresh COPY per leg: run() donates its state, which would delete
        # state_a's buffers out from under the second leg
        params_b = jax.tree.map(jnp.copy, state_a.params)
        state_b = state_a.replace(
            step=jnp.zeros((), jnp.int32),
            params=params_b,
            batch_stats=jax.tree.map(jnp.copy, state_a.batch_stats),
            opt_state=tx_b.init(params_b))
        state_b, f0, fB = run(model_b, cfg_b, state_b, tx_b, steps_b,
                              f"B {mode}")
        ap = ap_of(model_b, state_b)
        results[mode] = (f0, fB, ap)
        print(f"phase B [{mode}]: loss {f0:.2f} -> {fB:.2f}, "
              f"student mAP {ap:.3f}")

    (f0f, fBf, apf), (f0q, fBq, apq) = results["f32"], results["int8"]
    print(f"RESULT: student mAP f32-teacher {apf:.3f} vs "
          f"int8-teacher {apq:.3f} (delta {apq - apf:+.3f}); "
          f"final loss {fBf:.3f} vs {fBq:.3f}")


if __name__ == "__main__":
    main()
