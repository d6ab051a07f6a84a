from dsl_tpu.models.backbones.resnet import ResNet  # noqa: F401
from dsl_tpu.models.backbones.rla_resnet import RLAResNet  # noqa: F401
from dsl_tpu.models.necks.fpn import FPN  # noqa: F401
from dsl_tpu.models.dense_heads.fcos_head import (  # noqa: F401
    FCOSHead, fcos_get_bboxes, fcos_loss)
from dsl_tpu.models.detectors.single_stage import (  # noqa: F401
    FCOS, SingleStageDetector, build_detector, detector_loss,
    detector_predict)
