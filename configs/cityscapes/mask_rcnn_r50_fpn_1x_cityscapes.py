# Variant parity: reference configs/cityscapes/mask_rcnn_r50_fpn_1x_cityscapes.py
_base_ = ['faster_rcnn_r50_fpn_1x_cityscapes.py']
model = dict(
    type='MaskRCNN',
    mask_head=dict(type='FCNMaskHead', num_classes=8, in_channels=256,
                   conv_out_channels=256, num_convs=4, roi_size=14),
    test_cfg=dict(rcnn=dict(score_thr=0.05,
                            nms=dict(iou_threshold=0.5),
                            max_per_img=100, mask_thr_binary=0.5)))
