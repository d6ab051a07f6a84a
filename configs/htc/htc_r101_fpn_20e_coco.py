# Variant parity: reference configs/htc/htc_r101_fpn_20e_coco.py
_base_ = ['htc_r50_fpn_20e_coco.py']
model = dict(backbone=dict(depth=101))
