# Variant parity: reference configs/cascade_rpn/crpn_r50_caffe_fpn_1x_coco.py
_base_ = ['crpn_faster_rcnn_r50_caffe_fpn_1x_coco.py']
model = dict(type='RPN', bbox_head=None)
