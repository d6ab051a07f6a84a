# Variant parity: reference configs/resnest/faster_rcnn_s101_fpn_syncbn-backbone+head_mstrain-range_1x_coco.py
_base_ = ['faster_rcnn_s50_fpn_syncbn-backbone+head_mstrain-range_1x_coco.py']
model = dict(backbone=dict(depth=101, stem_channels=128))
