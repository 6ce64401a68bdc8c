"""Multi-host result merging.

Reference mechanism: merge_results_dist — every rank pickles its detection
list to a shared tmpdir, rank 0 concatenates after a barrier
(pcdet/utils/common_utils.py:236-257), plus object all_gather over NCCL
(commu_utils.py:50-112 all_gather_object / average_reduce_value).

TPU-native: no filesystem rendezvous — each host publishes its pickled
list to the jax.distributed coordination-service KV store (the gRPC
channel that already connects every process) and reads the peers' blobs
with a generous blocking timeout. This is deliberately NOT a Gloo/ICI
collective: the first collective of a process pair only has a ~30 s
rendezvous window, and eval ranks can reach the merge minutes apart
(per-rank jit compile skew) — observed deadlocking a 2-process CLI eval.
The KV path has no such window and preserves the reference's semantics
exactly: arbitrary per-sample dicts (variable-length boxes, `name`,
`frame_id`, nested `metadata`) survive the merge, concatenated in
process-id order.
"""

from __future__ import annotations

import itertools
import pickle

import numpy as np

# keys are write-once in the coordination KV store; a per-call generation
# keeps repeated gathers distinct. Consistent across ranks because every
# rank executes the same gather sequence (same program order).
_GATHER_GEN = itertools.count()

# coordination-service gRPC messages are size-limited; ship large blobs in
# chunks comfortably under the default 4 MiB cap.
_CHUNK_BYTES = 2 * 1024 * 1024

# eval compile skew between ranks can be minutes; be patient.
_TIMEOUT_MS = 30 * 60 * 1000


def _kv_client():
    from jax._src import distributed

    client = distributed.global_state.client
    assert client is not None, "jax.distributed is not initialized"
    return client


def _allgather_bytes(payload: bytes, timeout_ms: int = _TIMEOUT_MS):
    """All-gather one bytes blob per process via the coordination-service
    KV store; returns the list of blobs in process-id order."""
    import jax

    client = _kv_client()
    n, me = jax.process_count(), jax.process_index()
    gen = next(_GATHER_GEN)

    chunks = [payload[i: i + _CHUNK_BYTES]
              for i in range(0, len(payload), _CHUNK_BYTES)] or [b""]
    client.key_value_set(f"og/{gen}/{me}/n", str(len(chunks)))
    for i, ch in enumerate(chunks):
        client.key_value_set_bytes(f"og/{gen}/{me}/c{i}", ch)

    out = []
    for p in range(n):
        k = int(client.blocking_key_value_get(f"og/{gen}/{p}/n", timeout_ms))
        out.append(b"".join(
            client.blocking_key_value_get_bytes(f"og/{gen}/{p}/c{i}", timeout_ms)
            for i in range(k)
        ))
    # every rank must finish reading before the blobs are deleted
    client.wait_at_barrier(f"og/{gen}/done", timeout_ms)
    if me == 0:
        try:
            client.key_value_delete(f"og/{gen}/")
        except Exception:
            pass  # hygiene only; generation keys are never reused
    return out


def all_gather_object(obj):
    """Gather one arbitrary picklable object per process to every process
    (reference: commu_utils.all_gather_object over NCCL). Returns a list of
    length process_count() in process-id order."""
    import jax

    if jax.process_count() == 1:
        return [obj]
    return [pickle.loads(b) for b in _allgather_bytes(pickle.dumps(obj))]


def gather_detections(det_annos, axis_hint=None):
    """Gather per-host detection lists to every host.

    det_annos: list of per-sample dicts (numpy arrays + python metadata),
    exactly as produced by ``generate_prediction_dicts``. Returns the
    concatenation across processes in process-id order — semantics equal to
    the reference's merge_results_dist (common_utils.py:236-257), which
    pickles the full dicts: nothing is projected out, no box-count cap.
    Single-process: identity.
    """
    import jax

    if jax.process_count() == 1:
        return det_annos

    out = []
    for part in all_gather_object(list(det_annos)):
        out.extend(part)
    return out


def psum_scalar(value: float) -> float:
    """Cross-host scalar SUM — for additive counters (recall numerators,
    sample counts). NOTE: the reference's average_reduce_value AVERAGES;
    use `pmean_scalar` for that semantic."""
    return float(np.sum(all_gather_object(float(value))))


def pmean_scalar(value: float) -> float:
    """Cross-host scalar MEAN (reference: commu_utils.average_reduce_value,
    used for loss logging in the DDP train loop)."""
    return float(np.mean(all_gather_object(float(value))))
