# Variant parity: reference configs/paa/paa_r101_fpn_1x_coco.py
_base_ = ['paa_r50_fpn_1x_coco.py']
model = dict(backbone=dict(depth=101))
