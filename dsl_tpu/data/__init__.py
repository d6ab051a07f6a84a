from dsl_tpu.data import pipelines  # noqa: F401  (registers PIPELINES)
from dsl_tpu.data import datasets  # noqa: F401  (registers DATASETS)
from dsl_tpu.data.formatting import build_batch, format_sample  # noqa: F401
from dsl_tpu.data.coco_api import COCO  # noqa: F401
