# Fast R-CNN R-50-FPN model on precomputed proposals (reference
# configs/_base_/models/fast_rcnn_r50_fpn.py).
_base_ = 'faster_rcnn_r50_fpn.py'
model = dict(type='FastRCNN', rpn_head=None)
