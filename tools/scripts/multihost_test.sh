#!/usr/bin/env bash
# Multi-host evaluation launcher (reference: tools/scripts/dist_test.sh).
# Each host evaluates its index-slice of the dataset; detections are merged
# over ICI/DCN via process_allgather (parallel/multihost.py) — no tmpdir
# pickle rendezvous.
set -euo pipefail

export JAX_COORDINATOR_ADDRESS="${JAX_COORDINATOR:-${JAX_COORDINATOR_ADDRESS:-}}"
export JAX_PROCESS_COUNT="${JAX_PROCESS_COUNT:-1}"
export JAX_PROCESS_INDEX="${JAX_PROCESS_INDEX:-0}"

exec python tools/test.py "$@"
