#!/usr/bin/env bash
# reference parity: tools/dist_train.sh — no torchrun; the process drives
# every TPU device through the mesh.
set -e
CONFIG=$1; shift || true
python tools/train.py "$CONFIG" "$@"
