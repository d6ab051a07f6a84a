# Variant parity: reference configs/sparse_rcnn/sparse_rcnn_r101_fpn_mstrain_480-800_3x_coco.py
_base_ = ['sparse_rcnn_r50_fpn_mstrain_480-800_3x_coco.py']
model = dict(backbone=dict(depth=101))
