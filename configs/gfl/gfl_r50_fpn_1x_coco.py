_base_ = ['../retinanet/retinanet_r50_fpn_1x_coco.py']
model = dict(
    type='GFL',
    neck=dict(add_extra_convs='on_output', relu_before_extra_convs=True),
    bbox_head=dict(_delete_=True, type='GFLHead', num_classes=80,
                   in_channels=256, feat_channels=256, stacked_convs=4,
                   reg_max=16, strides=[8, 16, 32, 64, 128]),
    test_cfg=dict(nms=dict(iou_threshold=0.6)))
