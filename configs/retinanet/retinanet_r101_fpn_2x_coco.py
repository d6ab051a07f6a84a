# Variant parity: reference configs/retinanet/retinanet_r101_fpn_2x_coco.py
_base_ = ['retinanet_r50_fpn_1x_coco.py']
model = dict(backbone=dict(depth=101))
lr_config = dict(step=[16, 22])
runner = dict(max_epochs=24)
