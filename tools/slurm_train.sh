#!/usr/bin/env bash
# Slurm launcher: one task per host (not per chip — JAX drives all local
# chips from one process). jax.distributed.initialize() picks up the
# Slurm environment automatically.
set -x
PARTITION=$1
JOB_NAME=$2
CONFIG=$3
NODES=${NODES:-1}
SRUN_ARGS=${SRUN_ARGS:-""}
shift 3

srun -p "${PARTITION}" \
    --job-name="${JOB_NAME}" \
    --nodes="${NODES}" \
    --ntasks-per-node=1 \
    --kill-on-bad-exit=1 \
    ${SRUN_ARGS} \
    python -u "$(dirname "$0")/train.py" "${CONFIG}" "$@"
