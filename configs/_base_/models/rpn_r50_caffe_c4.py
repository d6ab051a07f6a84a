# Standalone RPN R-50-C4 (caffe) model (reference
# configs/_base_/models/rpn_r50_caffe_c4.py).
_base_ = 'faster_rcnn_r50_caffe_c4.py'
model = dict(type='RPN', bbox_head=None, shared_head=None)
