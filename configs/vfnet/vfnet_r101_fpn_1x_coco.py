# Variant parity: reference configs/vfnet/vfnet_r101_fpn_1x_coco.py
_base_ = ['vfnet_r50_fpn_1x_coco.py']
model = dict(backbone=dict(depth=101))
