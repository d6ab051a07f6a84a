# SSDLite: MobileNetV2 + depthwise SSDNeck
# (reference configs/ssd/ssdlite_mobilenetv2_scratch_600e_coco.py)
_base_ = ['../retinanet/retinanet_r50_fpn_1x_coco.py']
model = dict(
    _delete_=True,
    type='SSD',
    backbone=dict(type='MobileNetV2', out_indices=(4, 6)),
    neck=dict(type='SSDNeck', in_channels=(96, 320),
              out_channels=(96, 320, 512, 256, 256, 128),
              level_strides=(2, 2, 2, 2), level_paddings=(1, 1, 1, 1),
              use_depthwise=True, norm_cfg=dict(type='BN')),
    bbox_head=dict(type='SSDHead', num_classes=80,
                   in_channels=[96, 320, 512, 256, 256, 128],
                   strides=[16, 32, 64, 128, 256, 512]),
    test_cfg=dict(nms_pre=1000, score_thr=0.02,
                  nms=dict(type='nms', iou_threshold=0.45), max_per_img=200))
