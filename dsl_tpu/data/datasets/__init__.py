from dsl_tpu.data.datasets.custom import CustomDataset  # noqa: F401
from dsl_tpu.data.datasets.coco import CocoDataset, COCO_CLASSES  # noqa: F401
from dsl_tpu.data.datasets.semicoco import SemiCOCODataset  # noqa: F401
from dsl_tpu.data.datasets.voc import (  # noqa: F401
    VOCDataset, VOC_CLASSES, XMLDataset)
from dsl_tpu.data.datasets.semivoc import SemiVOCDataset  # noqa: F401
from dsl_tpu.data.datasets.voc2coco import Voc2CocoDataset  # noqa: F401
from dsl_tpu.data.datasets.wrappers import (  # noqa: F401
    ClassBalancedDataset, ConcatDataset, RepeatDataset)
from dsl_tpu.data.datasets.lvis import (  # noqa: F401
    CityscapesDataset, LVISDataset, LVISEval)
from dsl_tpu.data.datasets.lvis import DeepFashionDataset  # noqa: F401
from dsl_tpu.data.datasets.voc import WIDERFaceDataset  # noqa: F401
from dsl_tpu.data.datasets.coco_panoptic import (  # noqa: F401
    CocoPanopticDataset, rgb2id)
