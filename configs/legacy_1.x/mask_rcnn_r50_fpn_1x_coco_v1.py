# MMDet V1.x-compatible Mask R-CNN (reference
# configs/legacy_1.x/mask_rcnn_r50_fpn_1x_coco_v1.py). Mask-roi pooling
# keeps aligned RoIAlign (numerics-only difference for imported v1 weights).
_base_ = ['../mask_rcnn/mask_rcnn_r50_fpn_1x_coco.py']
model = dict(
    rpn_head=dict(
        anchor_generator=dict(
            type='LegacyAnchorGenerator', center_offset=0.5,
            scales=[8], ratios=[0.5, 1.0, 2.0], strides=[4, 8, 16, 32, 64]),
        bbox_coder=dict(type='LegacyDeltaXYWHBBoxCoder'),
        loss_bbox=dict(type='SmoothL1Loss', beta=1.0 / 9.0, loss_weight=1.0)),
    bbox_head=dict(
        bbox_coder=dict(type='LegacyDeltaXYWHBBoxCoder'),
        roi_aligned=False,
        loss_bbox=dict(type='SmoothL1Loss', beta=1.0, loss_weight=1.0)))
