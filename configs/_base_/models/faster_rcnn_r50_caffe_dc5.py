# Faster R-CNN R-50-DC5 (caffe) model: C5 dilated (stride 16), no neck
# (reference configs/_base_/models/faster_rcnn_r50_caffe_dc5.py).
_base_ = 'faster_rcnn_r50_fpn.py'
model = dict(
    backbone=dict(_delete_=True, type='ResNet', depth=50, style='caffe',
                  out_indices=(3,), strides=(1, 2, 2, 1),
                  dilations=(1, 1, 1, 2), frozen_stages=1),
    neck=dict(_delete_=True, type='IdentityNeck'),
    rpn_head=dict(_delete_=True, type='RPNHead', in_channels=2048,
                  feat_channels=2048, strides=[16]),
    bbox_head=dict(type='Shared2FCBBoxHead', num_classes=80,
                   in_channels=2048, roi_size=7, fc_channels=1024))
