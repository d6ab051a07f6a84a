# Plain (fully-supervised) FCOS (reference configs/fcos/fcos_r50_caffe_fpn_gn-head_1x_coco.py)
_base_ = ['../retinanet/retinanet_r50_fpn_1x_coco.py']
model = dict(
    _delete_=True,
    type='FCOS',
    backbone=dict(type='ResNet', depth=50, style='caffe',
                  out_indices=(0, 1, 2, 3)),
    neck=dict(type='FPN', in_channels=[256, 512, 1024, 2048],
              out_channels=256, start_level=1,
              add_extra_convs='on_output', num_outs=5,
              relu_before_extra_convs=True),
    bbox_head=dict(type='FCOSHead', num_classes=80, in_channels=256,
                   feat_channels=256, stacked_convs=4,
                   strides=[8, 16, 32, 64, 128], norm_on_bbox=True,
                   centerness_on_reg=True, center_sampling=True),
    test_cfg=dict(nms_pre=1000, score_thr=0.05,
                  nms=dict(type='nms', iou_threshold=0.6), max_per_img=100))
