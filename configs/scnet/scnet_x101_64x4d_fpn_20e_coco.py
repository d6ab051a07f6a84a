# Variant parity: reference configs/scnet/scnet_x101_64x4d_fpn_20e_coco.py
_base_ = ['scnet_r50_fpn_20e_coco.py']
model = dict(backbone=dict(type='ResNeXt', depth=101, groups=64,
                           base_width=4))
