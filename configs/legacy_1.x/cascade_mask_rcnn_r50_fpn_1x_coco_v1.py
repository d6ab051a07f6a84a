# MMDet V1.x-compatible Cascade Mask R-CNN (reference
# configs/legacy_1.x/cascade_mask_rcnn_r50_fpn_1x_coco_v1.py): legacy
# anchors/coder on RPN; per-stage legacy coders with the cascade std ladder.
_base_ = ['../cascade_rcnn/cascade_mask_rcnn_r50_fpn_1x_coco.py']
model = dict(
    rpn_head=dict(
        anchor_generator=dict(
            type='LegacyAnchorGenerator', center_offset=0.5,
            scales=[8], ratios=[0.5, 1.0, 2.0], strides=[4, 8, 16, 32, 64]),
        bbox_coder=dict(type='LegacyDeltaXYWHBBoxCoder')),
    bbox_heads=[
        dict(type='Shared2FCBBoxHead', num_classes=80, in_channels=256,
             roi_size=7, fc_channels=1024, reg_class_agnostic=True,
             roi_aligned=False,
             bbox_coder=dict(type='LegacyDeltaXYWHBBoxCoder',
                             target_stds=[0.1, 0.1, 0.2, 0.2])),
        dict(type='Shared2FCBBoxHead', num_classes=80, in_channels=256,
             roi_size=7, fc_channels=1024, reg_class_agnostic=True,
             roi_aligned=False,
             bbox_coder=dict(type='LegacyDeltaXYWHBBoxCoder',
                             target_stds=[0.05, 0.05, 0.1, 0.1])),
        dict(type='Shared2FCBBoxHead', num_classes=80, in_channels=256,
             roi_size=7, fc_channels=1024, reg_class_agnostic=True,
             roi_aligned=False,
             bbox_coder=dict(type='LegacyDeltaXYWHBBoxCoder',
                             target_stds=[0.033, 0.033, 0.067, 0.067])),
    ])
