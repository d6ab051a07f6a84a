#!/usr/bin/env bash
# Evaluate the EMA-teacher checkpoint of the flagship semi run
# (reference tools/semi_dist_test.sh parity; epoch_28.pth_ema -> the teacher
# subtree of the orbax checkpoint, selected by --use-teacher).
PYTHON=${PYTHON:-python}
CONFIG=${CONFIG:-"configs/fcos_semi/RLA_r50_fcos_semi_dsl.py"}
WORKDIR=${WORKDIR:-"work_dirs/RLA_r50_fcos_semi_dsl"}
CHECKPOINT=${CHECKPOINT:-"${WORKDIR}/epoch_28"}
echo "config: ${CONFIG}; checkpoint: ${CHECKPOINT} (teacher weights, --ema)"
PYTHONPATH="$(dirname $0)/..":$PYTHONPATH \
$PYTHON "$(dirname "$0")"/test.py "$CONFIG" "$CHECKPOINT" --ema \
    --launcher jax --eval bbox "$@"
