"""Multi-scene quality gate with error bars (VERDICT r3 #6).

The single-scene int8_quality protocol nearly mis-called the int8 stage-2
decision (scene-mAP deltas of ±0.02 are inside one scene's noise band).
This harness runs the same A/B protocol over N fixed-seed scenes and
reports mean ± std (and the standard error) of the per-scene deltas — the
standard ship/reject gate for teacher-formulation and kernel-semantics
changes.

Per scene (seed s):
  Phase A: jointly overfit the full distill graph (float S2D teacher) —
           a trained teacher whose BN stats describe the data.
  Phase B: freeze the teacher, reset the optimizer, distill the radar
           branch TWICE from the identical state — BASE leg vs VARIANT
           leg — and compare final distill loss + student scene mAP.

Variants (--variant):
  int8          BASE f32 teacher          VARIANT INT8=static (stages=arg)
  fp            BASE f32 teacher          VARIANT FP_STAGES=5 fused chain
  dcn_r8        BASE DCN_R=5 (shipped)    VARIANT DCN_R=8  (radar branch!)

Usage:
  JAX_COMPILATION_CACHE_DIR=.jax_tpu_cache python tools/quality_gate.py \
      --variant int8 --scenes 8 [--steps_a 300] [--steps_b 256] \
      [--grid 256] [--int8_stages 2]
"""

import argparse
import os
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import numpy as np


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--variant", choices=("int8", "fp", "dcn_r8"), required=True)
    p.add_argument("--scenes", type=int, default=8)
    p.add_argument("--steps_a", type=int, default=300)
    p.add_argument("--steps_b", type=int, default=256)
    p.add_argument("--grid", type=int, default=256)
    p.add_argument("--int8_stages", type=int, default=1)
    p.add_argument("--platform", type=str, default=None)
    args = p.parse_args()

    if args.platform:
        import jax
        jax.config.update("jax_platforms", args.platform)
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

    cfg, info = make_model_cfg(grid=args.grid, num_max_objs=64,
                               k_per_head=128, nms_post=32)
    cfg.BACKBONE_3D.NAME = "PillarRes18BackBone8x_S2D"
    teacher_freeze = list(cfg.FREEZE_PIPELINE)
    cfg.FREEZE_PIPELINE = []
    caps = {"MAX_LIDAR_POINTS": 8192, "MAX_RADAR_POINTS": 1024,
            "NUM_MAX_OBJS": 64}
    optim_cfg = ConfigDict(
        OPTIMIZER="adam_onecycle", LR=1e-3, WEIGHT_DECAY=0.01,
        MOMS=[0.95, 0.85], PCT_START=0.4, DIV_FACTOR=10, GRAD_NORM_CLIP=10,
    )
    frozen_scopes = [s for n_ in teacher_freeze
                     for s in FREEZE_NAME_TO_SCOPE.get(n_, ())]

    def leg_cfg(which):
        """(model_cfg, env) for the BASE/VARIANT leg of this --variant."""
        c = ConfigDict(cfg)
        c.FREEZE_PIPELINE = teacher_freeze
        c.BACKBONE_3D = ConfigDict(cfg.BACKBONE_3D)
        env = {}
        if args.variant == "int8" and which == "variant":
            c.BACKBONE_3D.INT8 = "static"
            c.BACKBONE_3D.INT8_STAGES = args.int8_stages
        if args.variant == "fp" and which == "variant":
            c.BACKBONE_3D.FP_STAGES = 5
        if args.variant == "dcn_r8":
            env["DCN_R"] = "8" if which == "variant" else "5"
        return c, env

    def run(model, model_cfg, state, tx, batch, n, tag):
        step = jax.jit(
            make_train_step(model, tx, model_cfg, CLASS_NAMES,
                            info["voxel_size"], info["point_cloud_range"]),
            donate_argnums=(0,))
        t0, last = time.time(), None
        for i in range(n):
            state, m = step(state, batch)
            if i == n - 1:
                last = float(m["loss"])
        print(f"    [{tag}] {n} steps, final loss {last:.3f} "
              f"({time.time() - t0:.0f}s)", flush=True)
        return state, last

    def ap_of(model, state, batch, scene):
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

    d_loss, d_ap = [], []
    for s in range(args.scenes):
        scene = make_scene(1000 + s, num_lidar=6000, num_radar=900,
                           num_boxes=8, pc_range=info["point_cloud_range"])
        b = collate_batch([scene], caps)
        b.pop("_host", None)
        batch = {k: jnp.asarray(v) for k, v in b.items()}
        print(f"scene {s}:", flush=True)

        # phase A: joint float overfit (shared by both legs)
        model_a = build_network(cfg, info, compute_dtype=jnp.bfloat16)
        tx_a, _ = build_optimizer(optim_cfg, None, total_steps=args.steps_a)
        state_a = create_train_state(model_a, tx_a, batch)
        state_a, _ = run(model_a, cfg, state_a, tx_a, batch, args.steps_a,
                         "A joint")

        res = {}
        for which in ("base", "variant"):
            c, env = leg_cfg(which)
            old = {k: os.environ.get(k) for k in env}
            os.environ.update(env)
            try:
                model_b = build_network(c, info, compute_dtype=jnp.bfloat16)
                tx_b, _ = build_optimizer(optim_cfg, state_a.params,
                                          total_steps=args.steps_b,
                                          frozen_scopes=frozen_scopes)
                params_b = jax.tree.map(jnp.copy, state_a.params)
                state_b = state_a.replace(
                    step=jnp.zeros((), jnp.int32), params=params_b,
                    batch_stats=jax.tree.map(jnp.copy, state_a.batch_stats),
                    opt_state=tx_b.init(params_b))
                state_b, fB = run(model_b, c, state_b, tx_b, batch,
                                  args.steps_b, f"B {which}")
                res[which] = (fB, ap_of(model_b, state_b, batch, scene))
            finally:
                for k, v in old.items():
                    if v is None:
                        os.environ.pop(k, None)
                    else:
                        os.environ[k] = v
        (lb, ab), (lv, av) = res["base"], res["variant"]
        d_loss.append(lv - lb)
        d_ap.append(av - ab)
        print(f"  scene {s}: loss {lb:.3f} -> {lv:.3f} (d {lv - lb:+.3f}), "
              f"mAP {ab:.3f} -> {av:.3f} (d {av - ab:+.3f})", flush=True)

    d_loss, d_ap = np.asarray(d_loss), np.asarray(d_ap)
    n = len(d_loss)
    se_l = d_loss.std(ddof=1) / np.sqrt(n) if n > 1 else float("nan")
    se_a = d_ap.std(ddof=1) / np.sqrt(n) if n > 1 else float("nan")
    print(f"\nRESULT variant={args.variant} over {n} scenes "
          f"(variant - base):")
    print(f"  distill-loss delta: {d_loss.mean():+.4f} ± {d_loss.std(ddof=1):.4f} "
          f"(SE {se_l:.4f})")
    print(f"  scene-mAP   delta: {d_ap.mean():+.4f} ± {d_ap.std(ddof=1):.4f} "
          f"(SE {se_a:.4f})")
    ship = (abs(d_loss.mean()) <= 2 * se_l) and (d_ap.mean() >= -2 * se_a)
    print(f"  gate: {'NEUTRAL-OR-BETTER (shippable)' if ship else 'REGRESSION (reject or justify)'}")


if __name__ == "__main__":
    main()
