# YOLOF R-50-C5 (reference configs/yolof/yolof_r50_c5_8x8_1x_coco.py)
_base_ = ['../retinanet/retinanet_r50_fpn_1x_coco.py']
model = dict(
    _delete_=True,
    type='YOLOF',
    backbone=dict(type='ResNet', depth=50, out_indices=(3,),
                  frozen_stages=1, style='caffe'),
    neck=dict(type='DilatedEncoder', in_channels=2048, out_channels=512,
              block_mid_channels=128, num_residual_blocks=4),
    bbox_head=dict(type='YOLOFHead', num_classes=80, in_channels=512,
                   strides=[32], anchor_scales=[1, 2, 4, 8, 16]),
    test_cfg=dict(nms_pre=1000, score_thr=0.05,
                  nms=dict(iou_threshold=0.6), max_per_img=100))
