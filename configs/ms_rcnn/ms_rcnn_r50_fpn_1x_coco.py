# Mask Scoring R-CNN R-50 (reference configs/ms_rcnn/ms_rcnn_r50_fpn_1x_coco.py)
_base_ = ['../mask_rcnn/mask_rcnn_r50_fpn_1x_coco.py']
model = dict(
    type='MaskScoringRCNN',
    mask_iou_head=dict(type='MaskIoUHead', num_classes=80, in_channels=256,
                       conv_out_channels=256, num_convs=4,
                       fc_out_channels=1024))
