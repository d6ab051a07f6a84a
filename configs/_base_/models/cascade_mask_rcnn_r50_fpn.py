# Cascade Mask R-CNN R-50-FPN model (reference
# configs/_base_/models/cascade_mask_rcnn_r50_fpn.py).
_base_ = 'cascade_rcnn_r50_fpn.py'
model = dict(
    mask_head=dict(type='FCNMaskHead', num_classes=80, in_channels=256,
                   conv_out_channels=256, num_convs=4, roi_size=14),
    test_cfg=dict(rcnn=dict(mask_thr_binary=0.5)))
