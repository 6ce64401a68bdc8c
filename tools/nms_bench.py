"""Micro-bench: on-device rotated NMS at decode sizes (default 500 cands).

r2 inference profile: NMS decode was ~77% of the radar-only forward
(pairwise clip intermediates + per-iteration predicate reduces). Run after
geometry/nms changes to quantify.

Usage: JAX_COMPILATION_CACHE_DIR=.jax_tpu_cache python tools/nms_bench.py [k] [scan]
"""

import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import numpy as np


def main():
    k = int(sys.argv[1]) if len(sys.argv) > 1 else 500
    scan = int(sys.argv[2]) if len(sys.argv) > 2 else 16

    import jax
    import jax.numpy as jnp

    jax.config.update(
        "jax_compilation_cache_dir", "/root/repo/.jax_tpu_cache")

    from radardistill_tpu.ops.nms import class_agnostic_nms

    rng = np.random.RandomState(0)
    boxes = np.zeros((k, 7), np.float32)
    boxes[:, :2] = rng.uniform(-54, 54, (k, 2))
    boxes[:, 2] = rng.uniform(-2, 2, k)
    boxes[:, 3:6] = rng.uniform(0.5, 6.0, (k, 3))
    boxes[:, 6] = rng.uniform(-np.pi, np.pi, k)
    scores = rng.rand(k).astype(np.float32)
    boxes, scores = jnp.asarray(boxes), jnp.asarray(scores)
    valid = jnp.ones((k,), bool)

    def multi(boxes, scores):
        def body(carry, _):
            b = boxes.at[:, 0].add(carry)
            idx, v = class_agnostic_nms(b, scores, valid, 0.2, k, 83)
            s = idx.sum() + v.sum()
            return (s * 1e-30).astype(boxes.dtype), s
        _, sums = jax.lax.scan(body, jnp.zeros((), boxes.dtype), None, length=scan)
        return sums

    j = jax.jit(multi)
    _ = float(np.asarray(j(boxes, scores)).sum())
    ts = []
    for _ in range(5):
        t0 = time.perf_counter()
        _ = float(np.asarray(j(boxes, scores)).sum())
        ts.append(time.perf_counter() - t0)
    print(f"nms k={k}: {np.median(ts)*1e3/scan:.2f} ms/call")


if __name__ == "__main__":
    main()
