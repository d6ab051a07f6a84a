_base_ = ['../retinanet/retinanet_r50_fpn_1x_coco.py']
model = dict(
    _delete_=True,
    type='SSD',
    backbone=dict(type='MobileNetV2', out_indices=(1, 2, 4, 6)),
    neck=dict(type='FPN', in_channels=[24, 32, 96, 320], out_channels=256,
              start_level=0, add_extra_convs='on_output', num_outs=5),
    bbox_head=dict(type='SSDHead', num_classes=80,
                   strides=[4, 8, 16, 32, 64]),
    test_cfg=dict(nms_pre=1000, score_thr=0.02,
                  nms=dict(type='nms', iou_threshold=0.45), max_per_img=100))
