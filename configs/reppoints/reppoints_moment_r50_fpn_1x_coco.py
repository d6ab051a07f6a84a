# RepPoints moment R-50 (reference configs/reppoints/reppoints_moment_r50_fpn_1x_coco.py)
_base_ = ['../retinanet/retinanet_r50_fpn_1x_coco.py']
model = dict(
    _delete_=True,
    type='RepPointsDetector',
    backbone=dict(type='ResNet', depth=50, out_indices=(0, 1, 2, 3),
                  frozen_stages=1, style='pytorch'),
    neck=dict(type='FPN', in_channels=[256, 512, 1024, 2048],
              out_channels=256, start_level=1, add_extra_convs='on_input',
              num_outs=5),
    bbox_head=dict(type='RepPointsHead', num_classes=80, in_channels=256,
                   feat_channels=256, point_feat_channels=256,
                   stacked_convs=3, num_points=9, gradient_mul=0.1,
                   point_base_scale=4, transform_method='moment'),
    test_cfg=dict(nms_pre=1000, score_thr=0.05,
                  nms=dict(iou_threshold=0.5), max_per_img=100))
