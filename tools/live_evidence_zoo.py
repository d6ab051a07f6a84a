"""On-chip zoo evidence: jitted loss + predict for ~10 family flagships.

VERDICT r3 next #5: TPU-lowering coverage for the zoo rested on the CPU
mesh alone. This CLI builds a tiny-channel variant of each family flagship
(tiny bounds the remote compile time; the op mix — RoI align, cascade
stages, deformable attention, corner pools, NMS — is the family's real
one), jits ``detector_loss`` and ``detector_predict`` on whatever backend
is live (the TPU via the axon relay when up), asserts finite outputs, and
writes a JSON evidence record.

Usage:  python tools/live_evidence_zoo.py [--out evidence/live_zoo.json]
        [--families faster_rcnn,atss,...]

Not a CLI the reference has — evidence tooling only.
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

R18 = dict(type="ResNet", depth=18, out_indices=(0, 1, 2, 3))
FPN18 = dict(type="FPN", in_channels=[64, 128, 256, 512], out_channels=32,
             start_level=0, num_outs=5)
FPN18_P3 = dict(type="FPN", in_channels=[64, 128, 256, 512], out_channels=32,
                start_level=1, add_extra_convs="on_output", num_outs=5)
RPN32 = dict(type="RPNHead", in_channels=32, feat_channels=32,
             strides=[4, 8, 16, 32, 64])
TEST_RCNN = dict(rcnn=dict(score_thr=0.02, nms=dict(iou_threshold=0.5),
                           max_per_img=10))


def _shared2fc(std=(0.1, 0.1, 0.2, 0.2)):
    return dict(type="Shared2FCBBoxHead", num_classes=4, in_channels=32,
                roi_size=7, fc_channels=64, target_stds=list(std))


FAMILIES = {
    "faster_rcnn": dict(
        type="FasterRCNN", backbone=R18, neck=FPN18, rpn_head=RPN32,
        bbox_head=_shared2fc(), test_cfg=TEST_RCNN),
    "mask_rcnn": dict(
        type="MaskRCNN", backbone=R18, neck=FPN18, rpn_head=RPN32,
        bbox_head=_shared2fc(),
        mask_head=dict(type="FCNMaskHead", num_classes=4, in_channels=32,
                       conv_out_channels=32, num_convs=1, roi_size=14),
        test_cfg=TEST_RCNN),
    "cascade_rcnn": dict(
        type="CascadeRCNN", backbone=R18, neck=FPN18, rpn_head=RPN32,
        bbox_heads=[_shared2fc((0.1, 0.1, 0.2, 0.2)),
                    _shared2fc((0.05, 0.05, 0.1, 0.1)),
                    _shared2fc((0.033, 0.033, 0.067, 0.067))],
        test_cfg=TEST_RCNN),
    "retinanet": dict(
        type="RetinaNet", backbone=R18, neck=FPN18_P3,
        bbox_head=dict(type="RetinaHead", num_classes=4, in_channels=32,
                       feat_channels=32, stacked_convs=1,
                       strides=[8, 16, 32, 64, 128]),
        test_cfg=dict(score_thr=0.02, nms=dict(iou_threshold=0.5),
                      max_per_img=10)),
    "atss": dict(
        type="ATSS", backbone=R18, neck=FPN18_P3,
        bbox_head=dict(type="ATSSHead", num_classes=4, in_channels=32,
                       feat_channels=32, stacked_convs=1,
                       strides=[8, 16, 32, 64, 128]),
        test_cfg=dict(score_thr=0.02, nms=dict(iou_threshold=0.5),
                      max_per_img=10)),
    "gfl": dict(
        type="GFL", backbone=R18, neck=FPN18_P3,
        bbox_head=dict(type="GFLHead", num_classes=4, in_channels=32,
                       feat_channels=32, stacked_convs=1,
                       strides=[8, 16, 32, 64, 128], reg_max=8),
        test_cfg=dict(score_thr=0.02, nms=dict(iou_threshold=0.5),
                      max_per_img=10)),
    "detr": dict(
        type="DETR", backbone=R18,
        bbox_head=dict(type="DETRHead", num_classes=4, in_channels=512,
                       embed_dims=32, num_heads=2, num_encoder_layers=1,
                       num_decoder_layers=1, ffn_dim=64, num_query=20),
        test_cfg=dict(max_per_img=10)),
    "deformable_detr": dict(
        type="DeformableDETR", backbone=R18,
        neck=dict(type="ChannelMapper", in_channels=[128, 256, 512],
                  out_channels=32, num_outs=4),
        bbox_head=dict(type="DeformableDETRHead", num_classes=4,
                       in_channels=32, embed_dims=32, num_heads=2,
                       num_encoder_layers=1, num_decoder_layers=1,
                       ffn_dim=64, num_query=20, num_levels=4),
        test_cfg=dict(max_per_img=10)),
    "yolo": dict(
        type="YOLOV3",
        backbone=dict(type="Darknet", depth=53, out_indices=(3, 4, 5)),
        neck=dict(type="YOLOV3Neck", in_channels=[256, 512, 1024],
                  out_channels=[128, 256, 512]),
        bbox_head=dict(type="YOLOV3Head", num_classes=4,
                       in_channels=[512, 256, 128]),
        test_cfg=dict(nms_pre=100, score_thr=0.02, conf_thr=0.005,
                      nms=dict(iou_threshold=0.45), max_per_img=10)),
    "cornernet": dict(
        type="CornerNet",
        backbone=dict(type="HourglassNet", downsample_times=3, num_stacks=2,
                      stage_channels=[16, 16, 24, 24], feat_channel=16,
                      stage_blocks=[1, 1, 1, 1]),
        bbox_head=dict(type="CornerHead", num_classes=4, in_channels=16,
                       num_feat_levels=2, corner_emb_channels=1),
        test_cfg=dict(corner_topk=12, local_maximum_kernel=3,
                      distance_threshold=0.5, score_thr=0.02,
                      nms=dict(iou_threshold=0.5), max_per_img=10)),
    "htc": dict(
        type="HTC", backbone=R18, neck=FPN18, rpn_head=RPN32,
        bbox_heads=[_shared2fc((0.1, 0.1, 0.2, 0.2)),
                    _shared2fc((0.05, 0.05, 0.1, 0.1)),
                    _shared2fc((0.033, 0.033, 0.067, 0.067))],
        mask_heads=[
            dict(type="HTCMaskHead", num_classes=4, in_channels=32,
                 conv_out_channels=32, num_convs=1, roi_size=14,
                 with_conv_res=False),
            dict(type="HTCMaskHead", num_classes=4, in_channels=32,
                 conv_out_channels=32, num_convs=1, roi_size=14),
            dict(type="HTCMaskHead", num_classes=4, in_channels=32,
                 conv_out_channels=32, num_convs=1, roi_size=14)],
        semantic_head=dict(type="FusedSemanticHead", num_ins=5,
                           fusion_level=1, num_convs=1, in_channels=32,
                           conv_out_channels=32, num_classes=6,
                           loss_weight=0.2),
        test_cfg=TEST_RCNN),
    "sparse_rcnn": dict(
        type="SparseRCNN", backbone=R18,
        neck=dict(type="FPN", in_channels=[64, 128, 256, 512],
                  out_channels=32, start_level=0, num_outs=4),
        rpn_head=dict(type="EmbeddingRPNHead", num_proposals=16,
                      proposal_feature_channel=32),
        bbox_heads=[dict(type="DIIHead", num_classes=4, in_channels=32,
                         roi_size=7, num_heads=2, feedforward_channels=64,
                         num_cls_fcs=1, num_reg_fcs=1,
                         dynamic_feat_channels=16) for _ in range(2)],
        test_cfg=dict(max_per_img=10, score_thr=0.0)),
    "yolact": dict(
        type="YOLACT", backbone=R18,
        neck=dict(type="FPN", in_channels=[64, 128, 256, 512],
                  out_channels=32, start_level=1, num_outs=5,
                  add_extra_convs="on_input",
                  upsample_cfg=dict(mode="bilinear")),
        bbox_head=dict(type="YOLACTHead", num_classes=4, in_channels=32,
                       feat_channels=32, num_head_convs=1, num_protos=8),
        segm_head=dict(type="YOLACTSegmHead", num_classes=4,
                       in_channels=32),
        mask_head=dict(type="YOLACTProtonet", num_protos=8, in_channels=32,
                       proto_channels=(16, 16, 16)),
        test_cfg=dict(nms_pre=100, score_thr=0.02, iou_thr=0.5,
                      nms=dict(iou_threshold=0.5), max_per_img=10)),
    "vfnet": dict(
        type="VFNet", backbone=R18, neck=FPN18_P3,
        bbox_head=dict(type="VFNetHead", num_classes=4, in_channels=32,
                       feat_channels=32, stacked_convs=1,
                       strides=[8, 16, 32, 64, 128]),
        test_cfg=dict(score_thr=0.02, nms=dict(iou_threshold=0.5),
                      max_per_img=10)),
    "paa": dict(
        type="PAA", backbone=R18, neck=FPN18_P3,
        bbox_head=dict(type="PAAHead", num_classes=4, in_channels=32,
                       feat_channels=32, stacked_convs=1,
                       strides=[8, 16, 32, 64, 128], topk=4),
        test_cfg=dict(score_thr=0.02, nms=dict(iou_threshold=0.5),
                      max_per_img=10)),
    "fcos_rla": dict(
        type="FCOS",
        backbone=dict(type="RLA_ResNet", layers=[1, 1, 1, 1],
                      frozen_stages=1),
        neck=dict(type="FPN", in_channels=[256, 512, 1024, 2048],
                  out_channels=32, start_level=1,
                  add_extra_convs="on_output", num_outs=5,
                  relu_before_extra_convs=True),
        bbox_head=dict(type="FCOSHead", num_classes=4, in_channels=32,
                       stacked_convs=1, feat_channels=32,
                       strides=[8, 16, 32, 64, 128], norm_on_bbox=True,
                       centerness_on_reg=True, center_sampling=True,
                       conv_bias=True),
        test_cfg=dict(nms_pre=100, score_thr=0.02,
                      nms=dict(iou_threshold=0.5), max_per_img=10)),
}

FPN18_P3_IN = dict(type="FPN", in_channels=[64, 128, 256, 512],
                   out_channels=32, start_level=1,
                   add_extra_convs="on_input", num_outs=5)
DENSE_TEST = dict(nms_pre=100, score_thr=0.02,
                  nms=dict(iou_threshold=0.5), max_per_img=10)
TINY_HOURGLASS = dict(type="HourglassNet", downsample_times=3, num_stacks=2,
                      stage_channels=[16, 16, 24, 24], feat_channel=16,
                      stage_blocks=[1, 1, 1, 1])
# HRNet-W8-ish: one module per stage, (8,16,32,64) branch widths
TINY_HR_EXTRA = dict(
    stage1=dict(num_modules=1, num_branches=1, block="BOTTLENECK",
                num_blocks=(1,), num_channels=(16,)),
    stage2=dict(num_modules=1, num_branches=2, block="BASIC",
                num_blocks=(1, 1), num_channels=(8, 16)),
    stage3=dict(num_modules=1, num_branches=3, block="BASIC",
                num_blocks=(1, 1, 1), num_channels=(8, 16, 32)),
    stage4=dict(num_modules=1, num_branches=4, block="BASIC",
                num_blocks=(1, 1, 1, 1), num_channels=(8, 16, 32, 64)))

# Tranche 2 (round 4): every remaining family whose op mix differs on-chip
# (DCN offsets, CARAFE reassembly, corner/centripetal pools, grid/point
# sampling, RFP recursion, trident branches, HRNet multi-resolution fusion).
FAMILIES.update(
    ssd=dict(
        type="SSD",
        backbone=dict(type="MobileNetV2", out_indices=(1, 2, 4, 6)),
        neck=dict(type="FPN", in_channels=[24, 32, 96, 320],
                  out_channels=32, start_level=0,
                  add_extra_convs="on_output", num_outs=5),
        bbox_head=dict(type="SSDHead", num_classes=4,
                       strides=[4, 8, 16, 32, 64], anchor_scales=[4.0]),
        test_cfg=dict(nms_pre=100, score_thr=0.02,
                      nms=dict(iou_threshold=0.45), max_per_img=10)),
    centernet=dict(
        type="CenterNet",
        backbone=dict(type="ResNet", depth=18, out_indices=(3,)),
        neck=dict(type="CTResNetNeck", in_channel=512,
                  num_deconv_filters=(64, 32, 32),
                  num_deconv_kernels=(4, 4, 4), use_dcn=True),
        bbox_head=dict(type="CenterNetHead", num_classes=4, in_channels=32,
                       feat_channels=32),
        test_cfg=dict(score_thr=0.02, max_per_img=10)),
    centripetalnet=dict(
        type="CentripetalNet", backbone=TINY_HOURGLASS,
        bbox_head=dict(type="CentripetalHead", num_classes=4,
                       in_channels=16, num_feat_levels=2,
                       corner_emb_channels=0),
        test_cfg=dict(corner_topk=12, local_maximum_kernel=3,
                      distance_threshold=0.5, score_thr=0.02,
                      nms=dict(iou_threshold=0.5), max_per_img=10)),
    reppoints=dict(
        type="RepPointsDetector", backbone=R18, neck=FPN18_P3_IN,
        bbox_head=dict(type="RepPointsHead", num_classes=4, in_channels=32,
                       feat_channels=32, point_feat_channels=32,
                       stacked_convs=1, strides=[8, 16, 32, 64, 128]),
        test_cfg=DENSE_TEST),
    fsaf=dict(
        type="FSAF", backbone=R18, neck=FPN18_P3_IN,
        bbox_head=dict(type="FSAFHead", num_classes=4, in_channels=32,
                       feat_channels=32, stacked_convs=1,
                       strides=[8, 16, 32, 64, 128]),
        test_cfg=DENSE_TEST),
    foveabox=dict(
        type="FOVEA", backbone=R18, neck=FPN18_P3_IN,
        bbox_head=dict(type="FoveaHead", num_classes=4, in_channels=32,
                       feat_channels=32, stacked_convs=1,
                       strides=[8, 16, 32, 64, 128]),
        test_cfg=DENSE_TEST),
    free_anchor=dict(
        type="RetinaNet", backbone=R18, neck=FPN18_P3_IN,
        bbox_head=dict(type="FreeAnchorRetinaHead", num_classes=4,
                       in_channels=32, feat_channels=32, stacked_convs=1,
                       strides=[8, 16, 32, 64, 128], pre_anchor_topk=8),
        test_cfg=DENSE_TEST),
    sabl=dict(
        type="RetinaNet", backbone=R18, neck=FPN18_P3_IN,
        bbox_head=dict(type="SABLRetinaHead", num_classes=4, in_channels=32,
                       feat_channels=32, stacked_convs=1),
        test_cfg=DENSE_TEST),
    guided_anchoring=dict(
        type="RetinaNet", backbone=R18, neck=FPN18_P3_IN,
        bbox_head=dict(type="GARetinaHead", num_classes=4, in_channels=32,
                       feat_channels=32, stacked_convs=1),
        test_cfg=DENSE_TEST),
    yolof=dict(
        type="YOLOF",
        backbone=dict(type="ResNet", depth=18, out_indices=(3,)),
        neck=dict(type="DilatedEncoder", in_channels=512, out_channels=64,
                  block_mid_channels=32, num_residual_blocks=2),
        bbox_head=dict(type="YOLOFHead", num_classes=4, in_channels=64,
                       strides=[32], anchor_scales=[1, 2, 4]),
        test_cfg=dict(nms_pre=50, score_thr=0.02,
                      nms=dict(iou_threshold=0.6), max_per_img=10)),
    autoassign=dict(
        type="AutoAssign", backbone=R18, neck=FPN18_P3,
        bbox_head=dict(type="AutoAssignHead", num_classes=4, in_channels=32,
                       feat_channels=32, stacked_convs=1,
                       strides=[8, 16, 32, 64, 128]),
        test_cfg=DENSE_TEST),
    nas_fcos=dict(
        type="FCOS",
        backbone=dict(type="ResNet", depth=18, out_indices=(1, 2, 3)),
        neck=dict(type="NASFCOS_FPN", in_channels=[128, 256, 512],
                  out_channels=32, num_outs=5),
        bbox_head=dict(type="NASFCOSHead", num_classes=4, in_channels=32,
                       feat_channels=32),
        test_cfg=DENSE_TEST),
    grid_rcnn=dict(
        type="GridRCNN", backbone=R18, neck=FPN18, rpn_head=RPN32,
        bbox_head=dict(type="Shared2FCBBoxHead", num_classes=4,
                       in_channels=32, roi_size=7, fc_channels=64,
                       with_reg=False),
        grid_head=dict(type="GridHead", grid_points=9, num_convs=2,
                       roi_size=14, in_channels=32, point_feat_channels=8),
        test_cfg=TEST_RCNN),
    ms_rcnn=dict(
        type="MaskScoringRCNN", backbone=R18, neck=FPN18, rpn_head=RPN32,
        bbox_head=_shared2fc(),
        mask_head=dict(type="FCNMaskHead", num_classes=4, in_channels=32,
                       conv_out_channels=32, num_convs=1, roi_size=14),
        mask_iou_head=dict(type="MaskIoUHead", num_classes=4,
                           in_channels=32, conv_out_channels=32,
                           num_convs=2, fc_out_channels=64),
        test_cfg=TEST_RCNN),
    point_rend=dict(
        type="PointRend", backbone=R18, neck=FPN18, rpn_head=RPN32,
        bbox_head=_shared2fc(),
        mask_head=dict(type="CoarseMaskHead", num_classes=4, in_channels=32,
                       roi_size=14, num_convs=0, num_fcs=2,
                       fc_out_channels=64, downsample_factor=2),
        point_head=dict(type="MaskPointHead", num_classes=4, num_fcs=3,
                        in_channels=32, fc_channels=32),
        test_cfg=dict(rcnn=dict(score_thr=0.02,
                                nms=dict(iou_threshold=0.5), max_per_img=8),
                      subdivision_steps=2, subdivision_num_points=32)),
    scnet=dict(
        type="SCNet", backbone=R18, neck=FPN18, rpn_head=RPN32,
        bbox_heads=[dict(type="SCNetBBoxHead", num_classes=4,
                         in_channels=32, roi_size=7, fc_channels=64,
                         target_stds=s)
                    for s in [(0.1, 0.1, 0.2, 0.2), (0.05, 0.05, 0.1, 0.1),
                              (0.033, 0.033, 0.067, 0.067)]],
        mask_head=dict(type="SCNetMaskHead", num_classes=4, in_channels=32,
                       conv_out_channels=32, num_convs=2, roi_size=14),
        semantic_head=dict(type="FusedSemanticHead", num_ins=5,
                           fusion_level=1, num_convs=1, in_channels=32,
                           conv_out_channels=32, num_classes=6,
                           loss_weight=0.2),
        glbctx_head=dict(type="GlobalContextHead", num_convs=2,
                         in_channels=32, conv_out_channels=32,
                         num_classes=4, loss_weight=3.0, conv_to_res=True),
        relay_head=dict(type="FeatureRelayHead", in_channels=64,
                        out_conv_channels=32, roi_feat_size=7,
                        scale_factor=2),
        test_cfg=dict(rcnn=dict(score_thr=0.02,
                                nms=dict(iou_threshold=0.5),
                                max_per_img=8))),
    detectors=dict(
        type="DetectoRS",
        backbone=dict(type="DetectoRSResNet", depth=50, stem_channels=8,
                      rfp_inplanes=32),
        neck=dict(type="RFP", in_channels=[256, 512, 1024, 2048],
                  out_channels=32, num_outs=5, rfp_steps=2,
                  aspp_out_channels=8,
                  rfp_backbone=dict(type="DetectoRSResNet", depth=50,
                                    stem_channels=8, rfp_inplanes=32)),
        rpn_head=RPN32, bbox_head=_shared2fc(), test_cfg=TEST_RCNN),
    tridentnet=dict(
        type="TridentFasterRCNN",
        backbone=dict(type="TridentResNet", depth=50, stem_channels=8,
                      num_branch=3, test_branch_idx=1),
        neck=dict(type="ChannelMapper", in_channels=[1024], out_channels=32,
                  num_outs=5),
        rpn_head=dict(type="RPNHead", in_channels=32, feat_channels=32,
                      strides=[16, 32, 64, 128, 256]),
        bbox_head=_shared2fc(), test_cfg=TEST_RCNN),
    double_heads=dict(
        type="DoubleHeadRCNN", backbone=R18, neck=FPN18, rpn_head=RPN32,
        bbox_head=dict(type="DoubleConvFCBBoxHead", num_classes=4,
                       in_channels=32, roi_size=7, num_convs=1, num_fcs=2,
                       conv_out_channels=32, fc_out_channels=64,
                       reg_roi_scale_factor=1.3),
        test_cfg=TEST_RCNN),
    cascade_rpn=dict(
        type="FasterRCNN", backbone=R18, neck=FPN18,
        rpn_head=dict(type="CascadeRPNHead", in_channels=32,
                      feat_channels=32, strides=[4, 8, 16, 32, 64],
                      anchor_scale=8.0),
        bbox_head=_shared2fc(), test_cfg=TEST_RCNN),
    dcn=dict(
        type="FasterRCNN",
        # depth>=50: BasicBlock rejects dcn (mmdet parity), so use a thin
        # Bottleneck R50 (base_channels=16 -> same [64,128,256,512] outs)
        backbone=dict(type="ResNet", depth=50, base_channels=16,
                      out_indices=(0, 1, 2, 3), dcn=dict(type="DCNv2"),
                      stage_with_dcn=(False, True, True, True)),
        neck=FPN18, rpn_head=RPN32, bbox_head=_shared2fc(),
        test_cfg=TEST_RCNN),
    hrnet=dict(
        type="FasterRCNN",
        backbone=dict(type="HRNet", extra=TINY_HR_EXTRA),
        neck=dict(type="HRFPN", in_channels=[8, 16, 32, 64],
                  out_channels=32, num_outs=5),
        rpn_head=RPN32, bbox_head=_shared2fc(), test_cfg=TEST_RCNN),
    carafe=dict(
        type="FasterRCNN", backbone=R18,
        neck=dict(type="FPN_CARAFE", in_channels=[64, 128, 256, 512],
                  out_channels=32, num_outs=5),
        rpn_head=RPN32, bbox_head=_shared2fc(), test_cfg=TEST_RCNN),
    libra=dict(
        type="FasterRCNN", backbone=R18,
        neck=[dict(type="FPN", in_channels=[64, 128, 256, 512],
                   out_channels=32, start_level=0, num_outs=5),
              dict(type="BFP", in_channels=32, num_levels=5,
                   refine_level=2)],
        rpn_head=RPN32, bbox_head=_shared2fc(), test_cfg=TEST_RCNN),
)


def _batch(jnp, b=2, size=64, k=3, with_mask_areas=False):
    rng = np.random.RandomState(0)
    gt = np.zeros((b, k, 4), np.float32)
    gt[:, 0] = [8, 8, 40, 40]
    gt[:, 1] = [20, 24, 56, 60]
    valid = np.zeros((b, k), bool)
    valid[:, :2] = True
    crops = np.zeros((b, k, 28, 28), np.uint8)
    crops[:, 0] = 1
    crops[:, 1, :, :14] = 1
    extra = {}
    if with_mask_areas:        # only ms_rcnn reads it — keeping the key out
        # of every other family's batch keeps their jit signatures (and the
        # relay's cross-process compile cache entries) unchanged
        box_area = (gt[..., 2] - gt[..., 0]) * (gt[..., 3] - gt[..., 1])
        extra["gt_mask_areas"] = jnp.asarray(
            crops.mean((2, 3)).astype(np.float32) * box_area)
    return dict(
        **extra,
        images=jnp.asarray(rng.rand(b, size, size, 3), jnp.float32),
        gt_bboxes=jnp.asarray(gt),
        gt_labels=jnp.asarray(np.tile([1, 0, 0], (b, 1)), jnp.int32),
        gt_valid=jnp.asarray(valid),
        ignore_bboxes=jnp.zeros((b, 2, 4), jnp.float32),
        ignore_valid=jnp.zeros((b, 2), bool),
        gt_mask_crops=jnp.asarray(crops),
        img_shapes=jnp.asarray([[size, size]] * b, jnp.float32),
        scale_factors=jnp.ones((b, 4), jnp.float32),
    )


def run_family(name: str, jit_all: bool = True):
    import jax
    import jax.numpy as jnp

    from dsl_tpu.models.detectors.single_stage import (
        build_detector, detector_loss, detector_predict,
        init_detector_variables)

    cfg = dict(FAMILIES[name])
    test_cfg = cfg.get("test_cfg")
    det = build_detector(cfg)
    batch = _batch(jnp, with_mask_areas=(name == "ms_rcnn"))
    variables = init_detector_variables(
        det, jax.random.PRNGKey(0), batch["images"][:1])

    t0 = time.perf_counter()
    loss_fn = lambda v, b: detector_loss(det, v, b)
    pred_fn = lambda v, im, sh, sf: detector_predict(
        det, v, im, img_shapes=sh, scale_factors=sf, test_cfg=test_cfg)
    if jit_all:
        loss_fn = jax.jit(loss_fn)
        pred_fn = jax.jit(pred_fn)
    total, logs = loss_fn(variables, batch)
    total = float(total)                       # forces the device chain
    t_loss = time.perf_counter() - t0

    t0 = time.perf_counter()
    out = pred_fn(variables, batch["images"], batch["img_shapes"],
                  batch["scale_factors"])
    dets = np.asarray(out[0])
    t_pred = time.perf_counter() - t0

    assert np.isfinite(total), f"{name}: loss not finite"
    assert np.isfinite(dets).all(), f"{name}: non-finite dets"
    assert dets.ndim == 3 and dets.shape[-1] == 5
    return dict(loss=round(total, 4),
                loss_keys=sorted(k for k in logs if "loss" in k),
                dets_shape=list(dets.shape),
                t_loss_s=round(t_loss, 2), t_pred_s=round(t_pred, 2))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--out", default="evidence/live_zoo.json")
    ap.add_argument("--families", default=",".join(FAMILIES))
    args = ap.parse_args()

    import jax

    platform = jax.devices()[0].platform
    record = dict(platform=platform, families={})
    if os.path.exists(args.out):      # merge: successive runs accumulate
        with open(args.out) as f:
            prev = json.load(f)
        if prev.get("platform") == platform:
            record["families"].update(prev.get("families", {}))
    for name in args.families.split(","):
        name = name.strip()
        if not name:
            continue
        print(f"[{platform}] {name} ...", flush=True)
        try:
            record["families"][name] = run_family(name)
            print(f"  ok: {record['families'][name]}", flush=True)
        except Exception as e:                          # noqa: BLE001
            record["families"][name] = dict(error=repr(e)[:300])
            print(f"  FAIL: {e!r}", flush=True)
    os.makedirs(os.path.dirname(args.out) or ".", exist_ok=True)
    with open(args.out, "w") as f:
        json.dump(record, f, indent=1, sort_keys=True)
    n_ok = sum("error" not in v for v in record["families"].values())
    print(f"live zoo evidence: {n_ok}/{len(record['families'])} ok "
          f"on {platform} -> {args.out}")
    if n_ok < len(record["families"]):
        raise SystemExit(1)


if __name__ == "__main__":
    main()
