# Variant parity: reference configs/yolact/yolact_r101_1x8_coco.py
_base_ = ['yolact_r50_1x8_coco.py']
model = dict(backbone=dict(depth=101))
