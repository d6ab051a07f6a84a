# SSD300 VGG-16 model (reference configs/_base_/models/ssd300.py).
model = dict(
    type='SSD',
    backbone=dict(type='SSDVGG', input_size=300, depth=16),
    neck=None,
    bbox_head=dict(type='SSDHead', num_classes=80,
                   in_channels=[512, 1024, 512, 256, 256, 256],
                   strides=[8, 16, 32, 64, 100, 300],
                   anchor_generator=dict(
                       type='SSDAnchorGenerator', scale_major=False,
                       input_size=300, basesize_ratio_range=(0.15, 0.9),
                       strides=[8, 16, 32, 64, 100, 300],
                       ratios=[[2], [2, 3], [2, 3], [2, 3], [2], [2]]),
                   bbox_coder=dict(type='DeltaXYWHBBoxCoder',
                                   target_means=[0.0, 0.0, 0.0, 0.0],
                                   target_stds=[0.1, 0.1, 0.2, 0.2])),
    test_cfg=dict(nms_pre=1000, score_thr=0.02,
                  nms=dict(type='nms', iou_threshold=0.45), max_per_img=200))
