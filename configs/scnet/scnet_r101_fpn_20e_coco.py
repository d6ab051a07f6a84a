# Variant parity: reference configs/scnet/scnet_r101_fpn_20e_coco.py
_base_ = ['scnet_r50_fpn_20e_coco.py']
model = dict(backbone=dict(depth=101))
