#!/usr/bin/env bash
# Multi-host training launcher (reference: tools/scripts/dist_train.sh, the
# torch.distributed.launch wrapper). On TPU pods there is ONE process per
# host; jax.distributed.initialize() wires them over the coordinator.
#
# Usage (run on EVERY host of the slice):
#   JAX_COORDINATOR=10.0.0.2:8476 JAX_PROCESS_COUNT=4 JAX_PROCESS_INDEX=$i \
#     bash tools/scripts/multihost_train.sh --cfg_file tools/cfgs/radar_distill/radar_distill_train.yaml
#
# On Cloud TPU VMs jax auto-discovers these from the metadata server, so a
# plain `python tools/train.py ...` per host also works.

set -euo pipefail

export JAX_COORDINATOR_ADDRESS="${JAX_COORDINATOR:-${JAX_COORDINATOR_ADDRESS:-}}"
export JAX_PROCESS_COUNT="${JAX_PROCESS_COUNT:-1}"
export JAX_PROCESS_INDEX="${JAX_PROCESS_INDEX:-0}"

exec python tools/train.py "$@"
