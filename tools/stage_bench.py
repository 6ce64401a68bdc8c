"""Per-stage TPU micro-bench: times VFE / backbone / CMA / neck / head /
targets / NMS separately at the full grid to direct kernel optimization.

Usage: python tools/stage_bench.py [grid] [batch]
"""

import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import numpy as np


def scalarize(fn):
    """Reduce a fn's output pytree to one scalar so timing can force a real
    host readback — on the axon tunnel block_until_ready does NOT sync
    (see CLAUDE.md); only materializing a value does."""
    import jax
    import jax.numpy as jnp

    def g(*args):
        out = fn(*args)
        return jax.tree.reduce(
            lambda a, l: a + jnp.sum(l.astype(jnp.float32)), jax.tree.leaves(out), 0.0
        )
    return jax.jit(g)


def timeit(fn, *args, n=5):
    import numpy as np

    float(fn(*args))  # compile
    ts = []
    for _ in range(n):
        t0 = time.perf_counter()
        v = float(fn(*args))
        ts.append(time.perf_counter() - t0)
    return float(np.median(ts)) * 1e3


def main():
    import jax
    import jax.numpy as jnp

    jax.config.update(
        "jax_compilation_cache_dir",
        str(Path(__file__).resolve().parent.parent / ".jax_tpu_cache"),
    )

    grid = int(sys.argv[1]) if len(sys.argv) > 1 else 1440
    bs = int(sys.argv[2]) if len(sys.argv) > 2 else 1

    # round-trip overhead floor of the tunnel
    f_nop = scalarize(lambda x: x + 1.0)
    z = jnp.zeros((8, 128))
    print(f"call overhead (nop):  {timeit(f_nop, z):8.2f} ms")

    from radardistill_tpu.models.backbone_sparse2d import PillarRes18BackBone8x
    from radardistill_tpu.models.bev_backbone import BaseBEVBackboneV2
    from radardistill_tpu.models.center_head import CenterHead, HeadSpec, assign_targets, decode_and_nms
    from radardistill_tpu.models.distill import CMAHourglass
    from radardistill_tpu.models.vfe import DynamicPillarVFESimple2D
    from radardistill_tpu.utils.testing import CLASS_NAMES, HEADS_GROUPS

    rng = np.random.RandomState(0)
    key = jax.random.PRNGKey(0)
    dt = jnp.bfloat16
    H = W = grid
    h8 = grid // 8

    # VFE
    n_pts = 160_000
    pts = jnp.asarray(rng.uniform(-50, 50, (bs, n_pts, 5)).astype(np.float32))
    pmask = jnp.ones((bs, n_pts), bool)
    vfe = DynamicPillarVFESimple2D(
        num_filters=(32,), voxel_size=(0.075, 0.075, 8.0),
        point_cloud_range=(-54, -54, -5, 54, 54, 3), grid_size=(grid, grid),
    )
    vvars = vfe.init(key, pts, pmask, False)
    f_vfe = scalarize(lambda v, p, m: vfe.apply(v, p, m, False))
    f_vfe_raw = jax.jit(lambda v, p, m: vfe.apply(v, p, m, False))
    print(f"vfe({n_pts} pts):        {timeit(f_vfe, vvars, pts, pmask):8.2f} ms")

    bev, mask = f_vfe_raw(vvars, pts, pmask)
    bev = bev.astype(dt)

    # backbone
    bb = PillarRes18BackBone8x(dtype=dt)
    bvars = bb.init(key, bev, mask, False)
    f_bb = scalarize(lambda v, x, m: bb.apply(v, x, m, False))
    f_bb_raw = jax.jit(lambda v, x, m: bb.apply(v, x, m, False))
    print(f"sparse_backbone:      {timeit(f_bb, bvars, bev, mask):8.2f} ms")
    ms = f_bb_raw(bvars, bev, mask)

    # CMA
    cma = CMAHourglass(dtype=dt)
    cvars = cma.init(key, ms["x_conv4"], False)
    f_cma = scalarize(lambda v, x: cma.apply(v, x, False))
    print(f"cma_hourglass:        {timeit(f_cma, cvars, ms['x_conv4']):8.2f} ms")

    # neck
    neck = BaseBEVBackboneV2(dtype=dt)
    nvars = neck.init(key, ms["x_conv4"], ms["x_conv5"], False)
    f_neck = scalarize(lambda v, a, b: neck.apply(v, a, b, False))
    f_neck_raw = jax.jit(lambda v, a, b: neck.apply(v, a, b, False))
    print(f"bev_neck:             {timeit(f_neck, nvars, ms['x_conv4'], ms['x_conv5']):8.2f} ms")
    sp2d, _ = f_neck_raw(nvars, ms["x_conv4"], ms["x_conv5"])

    # head
    spec = HeadSpec(HEADS_GROUPS, CLASS_NAMES)
    head = CenterHead(spec=spec, dtype=dt)
    hvars = head.init(key, sp2d, False)
    f_head = scalarize(lambda v, x: head.apply(v, x, False))
    f_head_raw = jax.jit(lambda v, x: head.apply(v, x, False))
    print(f"center_head:          {timeit(f_head, hvars, sp2d):8.2f} ms")
    preds = f_head_raw(hvars, sp2d)

    # target assignment
    boxes = np.zeros((bs, 500, 10), np.float32)
    boxes[:, :60, 0:2] = rng.uniform(-50, 50, (bs, 60, 2))
    boxes[:, :60, 3:6] = rng.uniform(1, 5, (bs, 60, 3))
    boxes[:, :60, 9] = rng.randint(1, 11, (bs, 60))
    gt = jnp.asarray(boxes)
    f_tgt = scalarize(lambda g: assign_targets(
        g, spec, (h8, h8), 8, (0.075, 0.075, 8.0), (-54, -54, -5, 54, 54, 3)))
    print(f"target_assign:        {timeit(f_tgt, gt):8.2f} ms")

    # decode + NMS
    f_dec = scalarize(lambda p: decode_and_nms(
        p, spec, (h8, h8), 8, (0.075, 0.075, 8.0), (-54, -54, -5, 54, 54, 3),
        [-61.2, -61.2, -10, 61.2, 61.2, 10]))
    print(f"decode_nms:           {timeit(f_dec, preds):8.2f} ms")


if __name__ == "__main__":
    main()
