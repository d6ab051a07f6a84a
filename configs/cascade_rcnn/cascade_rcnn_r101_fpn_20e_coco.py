# Variant parity: reference configs/cascade_rcnn/cascade_rcnn_r101_fpn_20e_coco.py
_base_ = ['cascade_rcnn_r50_fpn_1x_coco.py']
model = dict(backbone=dict(depth=101))
lr_config = dict(step=[16, 19])
runner = dict(max_epochs=20)
