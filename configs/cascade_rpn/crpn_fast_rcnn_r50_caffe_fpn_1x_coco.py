# Variant parity: reference configs/cascade_rpn/crpn_fast_rcnn_r50_caffe_fpn_1x_coco.py
_base_ = ['crpn_faster_rcnn_r50_caffe_fpn_1x_coco.py']
model = dict(type='FastRCNN', rpn_head=None)
