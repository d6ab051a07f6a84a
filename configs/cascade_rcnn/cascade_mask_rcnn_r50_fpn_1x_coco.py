# Cascade Mask R-CNN R-50 (reference configs/cascade_rcnn/cascade_mask_rcnn_r50_fpn_1x_coco.py)
_base_ = ['./cascade_rcnn_r50_fpn_1x_coco.py']
model = dict(
    mask_head=dict(type='FCNMaskHead', num_classes=80, in_channels=256,
                   conv_out_channels=256, num_convs=4, roi_size=14))
