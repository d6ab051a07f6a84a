from dsl_tpu.data.datasets.custom import CustomDataset  # noqa: F401
from dsl_tpu.data.datasets.coco import CocoDataset, COCO_CLASSES  # noqa: F401
from dsl_tpu.data.datasets.semicoco import SemiCOCODataset  # noqa: F401
