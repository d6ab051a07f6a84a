#!/usr/bin/env bash
# Multi-host training launcher (reference tools/dist_train.sh parity).
# TPU-native: one PROCESS per HOST (each drives all its local chips via the
# mesh), coordinated by jax.distributed — replacing torch.distributed.launch's
# one-process-per-GPU model. Run this script once on every host:
#   COORDINATOR_ADDRESS=host0:29500 NUM_PROCESSES=4 PROCESS_ID=<this host> \
#     tools/dist_train.sh CONFIG [extra train.py args]
CONFIG=$1
PYTHONPATH="$(dirname $0)/..":$PYTHONPATH \
python "$(dirname "$0")"/train.py "$CONFIG" --launcher jax "${@:2}"
