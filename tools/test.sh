#!/usr/bin/env bash
# reference parity: tools/dist_test.sh / semi_dist_test.sh (--ema evaluates
# the teacher weights like testing epoch_N.pth_ema).
set -e
CONFIG=$1; CKPT=$2; shift 2 || true
python tools/test.py "$CONFIG" "$CKPT" "$@"
