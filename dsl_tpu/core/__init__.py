from dsl_tpu.core import boxes, nms, points  # noqa: F401
from dsl_tpu.core.boxes import (  # noqa: F401
    bbox_overlaps,
    bbox2distance,
    distance2bbox,
    bbox_area,
    clip_boxes,
    delta2bbox,
    bbox2delta,
)
from dsl_tpu.core.nms import nms, batched_nms, multiclass_nms, soft_nms  # noqa: F401
from dsl_tpu.core.points import MlvlPointGenerator  # noqa: F401
