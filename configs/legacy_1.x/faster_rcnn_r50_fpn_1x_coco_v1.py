# MMDet V1.x-compatible Faster R-CNN (reference
# configs/legacy_1.x/faster_rcnn_r50_fpn_1x_coco_v1.py): legacy anchors +
# legacy delta coder on RPN and RoI head, RoIAlign aligned=False
# (``roi_aligned`` on the bbox head), SmoothL1 losses.
_base_ = ['../faster_rcnn/faster_rcnn_r50_fpn_1x_coco.py']
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
