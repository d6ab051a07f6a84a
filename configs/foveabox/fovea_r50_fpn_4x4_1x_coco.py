# FoveaBox R-50 (reference configs/foveabox/fovea_r50_fpn_4x4_1x_coco.py)
_base_ = ['../retinanet/retinanet_r50_fpn_1x_coco.py']
model = dict(
    _delete_=True,
    type='FOVEA',
    backbone=dict(type='ResNet', depth=50, out_indices=(0, 1, 2, 3),
                  frozen_stages=1, style='pytorch'),
    neck=dict(type='FPN', in_channels=[256, 512, 1024, 2048],
              out_channels=256, start_level=1, add_extra_convs='on_input',
              num_outs=5),
    bbox_head=dict(type='FoveaHead', num_classes=80, in_channels=256,
                   feat_channels=256, stacked_convs=4,
                   strides=[8, 16, 32, 64, 128], sigma=0.4,
                   loss_cls=dict(type='FocalLoss', use_sigmoid=True,
                                 gamma=1.50, alpha=0.4, loss_weight=1.0),
                   loss_bbox=dict(type='SmoothL1Loss', beta=0.11,
                                  loss_weight=1.0)),
    test_cfg=dict(nms_pre=1000, score_thr=0.05,
                  nms=dict(iou_threshold=0.5), max_per_img=100))
