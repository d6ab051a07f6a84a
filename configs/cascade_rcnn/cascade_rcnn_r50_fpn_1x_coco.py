# Cascade R-CNN R-50 (reference configs/cascade_rcnn/cascade_rcnn_r50_fpn_1x_coco.py)
_base_ = ['../faster_rcnn/faster_rcnn_r50_fpn_1x_coco.py']
model = dict(
    _delete_=True,
    type='CascadeRCNN',
    backbone=dict(type='ResNet', depth=50, out_indices=(0, 1, 2, 3),
                  frozen_stages=1, style='pytorch'),
    neck=dict(type='FPN', in_channels=[256, 512, 1024, 2048],
              out_channels=256, start_level=0, num_outs=5),
    rpn_head=dict(type='RPNHead', in_channels=256, feat_channels=256,
                  strides=[4, 8, 16, 32, 64]),
    bbox_heads=[
        dict(type='Shared2FCBBoxHead', num_classes=80, in_channels=256,
             roi_size=7, fc_channels=1024, target_stds=[0.1, 0.1, 0.2, 0.2]),
        dict(type='Shared2FCBBoxHead', num_classes=80, in_channels=256,
             roi_size=7, fc_channels=1024,
             target_stds=[0.05, 0.05, 0.1, 0.1]),
        dict(type='Shared2FCBBoxHead', num_classes=80, in_channels=256,
             roi_size=7, fc_channels=1024,
             target_stds=[0.033, 0.033, 0.067, 0.067]),
    ],
    test_cfg=dict(rcnn=dict(score_thr=0.05, nms=dict(iou_threshold=0.5),
                            max_per_img=100)))
