from dsl_tpu.models.backbones.resnet import ResNet  # noqa: F401
from dsl_tpu.models.backbones.rla_resnet import RLAResNet  # noqa: F401
from dsl_tpu.models.backbones.mobilenet_v2 import MobileNetV2  # noqa: F401
from dsl_tpu.models.necks.fpn import FPN  # noqa: F401
from dsl_tpu.models.necks.pafpn import PAFPN  # noqa: F401
from dsl_tpu.models.backbones.resnet import ResNeXt  # noqa: F401
from dsl_tpu.models.dense_heads.fcos_head import (  # noqa: F401
    FCOSHead, fcos_get_bboxes, fcos_loss)
from dsl_tpu.models.dense_heads.retina_head import (  # noqa: F401
    RetinaHead, retina_get_bboxes, retina_loss)
from dsl_tpu.models.dense_heads.atss_head import (  # noqa: F401
    ATSSHead, atss_get_bboxes, atss_loss)
from dsl_tpu.models.dense_heads.gfl_head import (  # noqa: F401
    GFLHead, gfl_get_bboxes, gfl_loss)
from dsl_tpu.models.dense_heads.ssd_head import (  # noqa: F401
    SSDHead, ssd_get_bboxes, ssd_loss)
from dsl_tpu.models.detectors.single_stage import (  # noqa: F401
    ATSS, FCOS, RetinaNet, SingleStageDetector, build_detector,
    detector_loss, detector_predict)
from dsl_tpu.models.detectors.multi_head import (  # noqa: F401
    FCOSMultiHead, SingleStageMultiHeadDetector, build_multi_head_detector,
    multi_head_loss, multi_head_predict)
from dsl_tpu.models.dense_heads.rpn_head import (  # noqa: F401
    RPNHead, rpn_loss, rpn_proposals)
from dsl_tpu.models.roi_heads.standard_roi_head import (  # noqa: F401
    Shared2FCBBoxHead, roi_head_loss, roi_head_predict)
from dsl_tpu.models.detectors.two_stage import (  # noqa: F401
    FasterRCNN, MaskRCNN, TwoStageDetector, build_two_stage_detector,
    mask_rcnn_predict, two_stage_loss, two_stage_predict)
from dsl_tpu.models.roi_heads.mask_head import (  # noqa: F401
    FCNMaskHead, mask_head_loss, mask_targets_from_crops, paste_masks)
from dsl_tpu.models.backbones.darknet import Darknet  # noqa: F401
from dsl_tpu.models.dense_heads.yolo_head import (  # noqa: F401
    YOLOV3Head, YOLOV3Neck, yolo_get_bboxes, yolo_loss)
from dsl_tpu.models.detectors.cascade_rcnn import (  # noqa: F401
    CascadeRCNN, build_cascade_rcnn, cascade_rcnn_loss,
    cascade_rcnn_predict)
from dsl_tpu.models.dense_heads.centernet_head import (  # noqa: F401
    CenterNetHead, CTResNetNeck, centernet_get_bboxes, centernet_loss)
from dsl_tpu.models.dense_heads.vfnet_head import (  # noqa: F401
    VFNetHead, vfnet_get_bboxes, vfnet_loss)
from dsl_tpu.models.dense_heads.autoassign_head import (  # noqa: F401
    AutoAssignHead, autoassign_get_bboxes, autoassign_loss)
from dsl_tpu.models.dense_heads.paa_head import (  # noqa: F401
    PAAHead, paa_get_bboxes, paa_loss)
from dsl_tpu.models.backbones.res2net import Res2Net  # noqa: F401
from dsl_tpu.models.backbones.hrnet import HRNet  # noqa: F401
from dsl_tpu.models.necks.hrfpn import HRFPN  # noqa: F401
from dsl_tpu.models.dense_heads.reppoints_head import (  # noqa: F401
    RepPointsHead, reppoints_get_bboxes, reppoints_loss)
from dsl_tpu.models.backbones.regnet import RegNet  # noqa: F401
from dsl_tpu.models.necks.bfp import BFP  # noqa: F401
from dsl_tpu.models.dense_heads.detr_head import (  # noqa: F401
    DETRHead, detr_get_bboxes, detr_loss)
from dsl_tpu.models.dense_heads.fovea_head import (  # noqa: F401
    FoveaHead, fovea_get_bboxes, fovea_loss)
from dsl_tpu.models.dense_heads.fsaf_head import (  # noqa: F401
    FSAFHead, fsaf_get_bboxes, fsaf_loss)
from dsl_tpu.models.dense_heads.free_anchor_head import (  # noqa: F401
    FreeAnchorRetinaHead, free_anchor_loss)
from dsl_tpu.models.dense_heads.yolof_head import (  # noqa: F401
    DilatedEncoder, YOLOFHead, yolof_get_bboxes, yolof_loss)
from dsl_tpu.models.roi_heads.maskiou_head import (  # noqa: F401
    MaskIoUHead, mask_iou_loss, mask_iou_target)
from dsl_tpu.models.detectors.two_stage import MaskScoringRCNN  # noqa: F401
from dsl_tpu.ops.misc_ops import (  # noqa: F401
    carafe, corner_pool, nms_match, point_sample)
from dsl_tpu.models.backbones.hourglass import HourglassNet  # noqa: F401
from dsl_tpu.models.dense_heads.corner_head import (  # noqa: F401
    CentripetalHead, CornerHead, centripetal_loss, corner_get_bboxes,
    corner_loss)
from dsl_tpu.models.dense_heads.yolact_head import (  # noqa: F401
    YOLACTHead, YOLACTProtonet, YOLACTSegmHead, yolact_full_predict,
    yolact_loss, yolact_predict)
from dsl_tpu.models.detectors.single_stage import YOLACT  # noqa: F401
from dsl_tpu.models.dense_heads.sabl_retina_head import (  # noqa: F401
    SABLRetinaHead, sabl_get_bboxes, sabl_loss)
from dsl_tpu.models.dense_heads.ga_retina_head import (  # noqa: F401
    GARetinaHead, ga_retina_get_bboxes, ga_retina_loss)
from dsl_tpu.models.roi_heads.grid_head import (  # noqa: F401
    GridHead, grid_decode, grid_loss, grid_targets)
from dsl_tpu.models.detectors.two_stage import (  # noqa: F401
    GridRCNN, grid_rcnn_predict)
from dsl_tpu.models.roi_heads.point_rend import (  # noqa: F401
    CoarseMaskHead, MaskPointHead, point_rend_refine,
    point_targets_from_crops, uncertain_points_train)
from dsl_tpu.models.detectors.two_stage import PointRend  # noqa: F401
from dsl_tpu.models.roi_heads.double_bbox_head import (  # noqa: F401
    DoubleConvFCBBoxHead, scale_rois)
from dsl_tpu.models.detectors.two_stage import DoubleHeadRCNN  # noqa: F401
from dsl_tpu.models.roi_heads.htc import (  # noqa: F401
    FusedSemanticHead, HTCMaskHead, semantic_seg_loss)
from dsl_tpu.models.detectors.cascade_rcnn import (  # noqa: F401
    HTC, htc_loss, htc_predict)
from dsl_tpu.models.roi_heads.sparse_rcnn import (  # noqa: F401
    DIIHead, EmbeddingRPNHead, SparseRCNN, build_sparse_rcnn,
    init_sparse_rcnn_variables, sparse_rcnn_loss, sparse_rcnn_predict)
from dsl_tpu.models.necks.channel_mapper import ChannelMapper  # noqa: F401
from dsl_tpu.models.dense_heads.deformable_detr_head import (  # noqa: F401
    DeformableDETRHead, MSDeformAttention, deformable_detr_get_bboxes,
    deformable_detr_loss)
from dsl_tpu.models.dense_heads.ld_head import LDHead, ld_loss  # noqa: F401
from dsl_tpu.models.dense_heads.pisa_heads import (  # noqa: F401
    PISARetinaHead, PISASSDHead, pisa_retina_loss, pisa_ssd_loss)
from dsl_tpu.models.detectors.single_stage import (  # noqa: F401
    KnowledgeDistillationSingleStageDetector)
from dsl_tpu.models.backbones.resnest import ResNeSt  # noqa: F401
from dsl_tpu.models.backbones.ssd_vgg import SSDVGG  # noqa: F401
from dsl_tpu.models.necks.nas_fpn import NASFPN  # noqa: F401
from dsl_tpu.models.necks.fpn_carafe import FPN_CARAFE  # noqa: F401
from dsl_tpu.models.backbones.detectors_resnet import (  # noqa: F401
    DetectoRSResNet, SAConv)
from dsl_tpu.models.necks.rfp import ASPP, RFP  # noqa: F401
from dsl_tpu.models.detectors.two_stage import DetectoRS  # noqa: F401
from dsl_tpu.models.backbones.trident_resnet import TridentResNet  # noqa: F401
from dsl_tpu.models.dense_heads.nasfcos_head import NASFCOSHead  # noqa: F401
from dsl_tpu.models.necks.nasfcos_fpn import (  # noqa: F401
    FPG, NASFCOS_FPN)
from dsl_tpu.models.roi_heads.scnet import (  # noqa: F401
    FeatureRelayHead, GlobalContextHead, SCNetBBoxHead, SCNetMaskHead,
    SimplifiedBasicBlock, global_context_loss)
from dsl_tpu.models.detectors.cascade_rcnn import (  # noqa: F401
    SCNet, scnet_loss, scnet_predict)
from dsl_tpu.models.dense_heads.ga_rpn_head import (  # noqa: F401
    GARPNHead, ga_rpn_loss, ga_rpn_proposals)
from dsl_tpu.models.dense_heads.cascade_rpn_head import (  # noqa: F401
    CascadeRPNHead, cascade_rpn_loss, cascade_rpn_proposals)
from dsl_tpu.models.roi_heads.sabl_head import (  # noqa: F401
    SABLHead, sabl_roi_loss, sabl_roi_predict)
from dsl_tpu.models.detectors.two_stage import (  # noqa: F401
    RPN, FastRCNN, fast_rcnn_predict, rpn_only_loss, rpn_only_predict)
from dsl_tpu.models.layers import (  # noqa: F401
    DropBlock, NormedConv, NormedLinear)
from dsl_tpu.models.detectors.two_stage import (  # noqa: F401
    TridentFasterRCNN, trident_loss)
from dsl_tpu.models.dense_heads.retina_head import (  # noqa: F401
    RetinaSepBNHead)
from dsl_tpu.models.detectors.two_stage import (  # noqa: F401
    DynamicRCNN, PISAFasterRCNN)
from dsl_tpu.models.roi_heads.dynamic_pisa import (  # noqa: F401
    DynamicRCNNSchedule, dynamic_roi_loss, pisa_roi_loss)
from dsl_tpu.models.roi_heads.standard_roi_head import (  # noqa: F401
    extract_roi_feats_generic)
from dsl_tpu.models.roi_heads.shared_heads import (  # noqa: F401
    BBoxHeadAvgPool, ResLayerSharedHead)
from dsl_tpu.models.necks.ssd_neck import SSDNeck  # noqa: F401
from dsl_tpu.models.necks.channel_mapper import IdentityNeck  # noqa: F401
from dsl_tpu.models.detectors.two_stage import FasterRCNNC4  # noqa: F401
from dsl_tpu.models.backbones.detectors_resnet import (  # noqa: F401
    DetectoRSResNeXt)
