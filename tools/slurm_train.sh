#!/usr/bin/env bash
# SLURM launcher (reference tools/slurm_train.sh parity): jax.distributed
# auto-detects the SLURM cluster env (no explicit coordinator needed).
PARTITION=$1
JOB_NAME=$2
CONFIG=$3
NODES=${NODES:-1}
PYTHONPATH="$(dirname $0)/..":$PYTHONPATH \
srun -p "$PARTITION" --job-name="$JOB_NAME" --nodes="$NODES" \
    --ntasks-per-node=1 --kill-on-bad-exit=1 \
    python "$(dirname "$0")"/train.py "$CONFIG" --launcher slurm "${@:4}"
