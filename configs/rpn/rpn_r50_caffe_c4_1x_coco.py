# Variant parity: reference configs/rpn/rpn_r50_caffe_c4_1x_coco.py
# (single C4 level, caffe-style R-50, stride-16 RPN)
_base_ = ['rpn_r50_fpn_1x_coco.py']
model = dict(
    backbone=dict(_delete_=True, type='ResNet', depth=50, style='caffe',
                  out_indices=(2,)),
    neck=dict(_delete_=True, type='IdentityNeck'),
    rpn_head=dict(_delete_=True, type='RPNHead', in_channels=1024,
                  feat_channels=1024, strides=[16]))
