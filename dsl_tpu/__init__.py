"""dsl_tpu: a TPU-native (JAX/XLA/pjit/Pallas) semi-supervised detection framework.

Re-implements the capabilities of chenbinghui1/DSL ("Dense Learning based
Semi-Supervised Object Detection", CVPR 2022, an mmdetection fork) with an
idiomatic JAX architecture:

- pure-functional flax models (ResNet/RLA-ResNet + FPN + FCOS head)
- a single jitted ``train_step(state, batch) -> (state, metrics)`` in which the
  EMA teacher update, per-source loss weighting and gradient ``psum`` over the
  device mesh all live *inside* the compiled program
- fixed-shape masked NMS / target assignment (XLA-friendly, no dynamic shapes)
- a device-resident pseudo-label store replacing the reference's per-image
  JSON files on disk
- COCO-protocol evaluation re-implemented in numpy (no pycocotools dep)

Reference layer map: /root/repo/SURVEY.md.
"""

from dsl_tpu.version import __version__, version_info  # noqa: F401

from dsl_tpu.config import Config  # noqa: F401
from dsl_tpu.registry import Registry, build_from_cfg  # noqa: F401
