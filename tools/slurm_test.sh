#!/usr/bin/env bash
# Slurm evaluation launcher (one task per host).
set -x
PARTITION=$1
JOB_NAME=$2
CONFIG=$3
CHECKPOINT=$4
NODES=${NODES:-1}
SRUN_ARGS=${SRUN_ARGS:-""}
shift 4

srun -p "${PARTITION}" \
    --job-name="${JOB_NAME}" \
    --nodes="${NODES}" \
    --ntasks-per-node=1 \
    --kill-on-bad-exit=1 \
    ${SRUN_ARGS} \
    python -u "$(dirname "$0")/test.py" "${CONFIG}" "${CHECKPOINT}" "$@"
