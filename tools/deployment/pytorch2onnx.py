#!/usr/bin/env python
"""Reference-layout placeholder for ``tools/deployment/pytorch2onnx.py``.

The reference's deployment tier targets ONNX/TensorRT/TorchServe (CUDA).
The TPU-native equivalents here are:

- ``tools/export.py``   — StableHLO export + reload-equivalence check
  (the ONNX-export analogue for the XLA/TPU stack)
- ``tools/serve.py``    — HTTP model server (the torchserve analogue)

This stub exists for tools-tree parity; it prints the mapping and exits.
"""
import sys

if __name__ == "__main__":
    sys.stderr.write(__doc__ + "\n")
    sys.exit(2)
