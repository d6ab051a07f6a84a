#!/usr/bin/env bash
# Multi-host eval launcher (reference tools/dist_test.sh parity); same
# one-process-per-host jax.distributed model as dist_train.sh.
CONFIG=$1
CHECKPOINT=$2
PYTHONPATH="$(dirname $0)/..":$PYTHONPATH \
python "$(dirname "$0")"/test.py "$CONFIG" "$CHECKPOINT" --launcher jax "${@:3}"
