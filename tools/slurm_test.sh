#!/usr/bin/env bash
# SLURM eval launcher (reference tools/slurm_test.sh parity).
PARTITION=$1
JOB_NAME=$2
CONFIG=$3
CHECKPOINT=$4
NODES=${NODES:-1}
PYTHONPATH="$(dirname $0)/..":$PYTHONPATH \
srun -p "$PARTITION" --job-name="$JOB_NAME" --nodes="$NODES" \
    --ntasks-per-node=1 --kill-on-bad-exit=1 \
    python "$(dirname "$0")"/test.py "$CONFIG" "$CHECKPOINT" --launcher slurm "${@:5}"
