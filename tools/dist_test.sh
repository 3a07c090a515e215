#!/usr/bin/env bash
# Multi-host evaluation: one process per host, chips driven via SPMD.
CONFIG=$1
CHECKPOINT=$2
shift 2
python "$(dirname "$0")/test.py" "$CONFIG" "$CHECKPOINT" "$@"
