# Standalone RPN R-50-FPN model, proposals as detections (reference
# configs/_base_/models/rpn_r50_fpn.py).
_base_ = 'faster_rcnn_r50_fpn.py'
model = dict(type='RPN', bbox_head=None)
