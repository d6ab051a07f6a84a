# Variant parity: reference configs/libra_rcnn/libra_fast_rcnn_r50_fpn_1x_coco.py
_base_ = ['libra_faster_rcnn_r50_fpn_1x_coco.py']
model = dict(type='FastRCNN', rpn_head=None)
