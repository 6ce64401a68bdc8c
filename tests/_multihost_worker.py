"""Subprocess worker for tests/test_multihost.py — a real 2-process CPU
"multi-host" jax.distributed job exercising the eval merge path
(reference: tools/test.py dist eval -> common_utils.merge_results_dist).

Run: python tests/_multihost_worker.py <process_id> <port>
Prints MH_OK <pid> on success (asserts raise otherwise).
"""

import sys

import jax

jax.config.update("jax_platforms", "cpu")

pid, port = int(sys.argv[1]), int(sys.argv[2])
jax.distributed.initialize(f"localhost:{port}", num_processes=2, process_id=pid)

import numpy as np  # noqa: E402

from radardistill_tpu.parallel.multihost import (  # noqa: E402
    all_gather_object,
    gather_detections,
    pmean_scalar,
    psum_scalar,
)

# per-host detection lists of DIFFERENT lengths with variable-length boxes
# and full metadata — everything eval_bridge._official_eval consumes
n_samples = 2 + pid
annos = []
for i in range(n_samples):
    n_box = 600 * pid + i + 1  # >512 on rank 1: no box-count cap allowed
    annos.append({
        "pred_boxes": np.full((n_box, 9), pid, np.float32),
        "pred_scores": np.linspace(0, 1, n_box).astype(np.float32),
        "pred_labels": np.ones(n_box, np.int64),
        "name": np.array(["car"] * n_box),
        "frame_id": f"p{pid}_s{i}",
        "metadata": {"token": f"tok_p{pid}_s{i}"},
    })

merged = gather_detections(annos)
assert len(merged) == 2 + 3, len(merged)  # rank0's 2 then rank1's 3
assert [d["frame_id"] for d in merged] == [
    "p0_s0", "p0_s1", "p1_s0", "p1_s1", "p1_s2"
]
assert merged[-1]["pred_boxes"].shape == (603, 9)  # un-capped
assert merged[0]["metadata"]["token"] == "tok_p0_s0"
assert merged[2]["name"][0] == "car"
np.testing.assert_allclose(
    merged[3]["pred_scores"], np.linspace(0, 1, 602).astype(np.float32)
)

objs = all_gather_object({"rank": pid})
assert [o["rank"] for o in objs] == [0, 1]

assert psum_scalar(1.5) == 3.0
assert pmean_scalar(float(pid)) == 0.5

print("MH_OK", pid, flush=True)
