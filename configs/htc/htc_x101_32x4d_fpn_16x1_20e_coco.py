# Variant parity: reference configs/htc/htc_x101_32x4d_fpn_16x1_20e_coco.py
_base_ = ['htc_r50_fpn_20e_coco.py']
model = dict(backbone=dict(type='ResNeXt', depth=101, groups=32,
                           base_width=4))
data = dict(samples_per_gpu=1)
