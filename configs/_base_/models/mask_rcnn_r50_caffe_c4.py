# Mask R-CNN R-50-C4 (caffe) model (reference
# configs/_base_/models/mask_rcnn_r50_caffe_c4.py).
_base_ = 'faster_rcnn_r50_caffe_c4.py'
model = dict(
    type='MaskRCNNC4',
    mask_head=dict(type='FCNMaskHead', num_classes=80, in_channels=2048,
                   conv_out_channels=256, num_convs=0, roi_size=14),
    test_cfg=dict(rcnn=dict(mask_thr_binary=0.5)))
