#!/usr/bin/env bash
# Multi-host data-parallel training.
#
# The reference wraps torch.distributed.launch (1 proc/GPU). On TPU, JAX
# is SPMD: ONE process per host drives every local chip, and cross-host
# wiring comes from the TPU runtime (or JAX_COORDINATOR_ADDRESS /
# JAX_PROCESS_ID / JAX_NUM_PROCESSES env for CPU/GPU-style bring-up).
# Run this same script on every host of the slice.
CONFIG=$1
shift
python "$(dirname "$0")/train.py" "$CONFIG" "$@"
