# Variant parity: reference configs/scnet/scnet_x101_64x4d_fpn_8x1_20e_coco.py
_base_ = ['scnet_x101_64x4d_fpn_20e_coco.py']
data = dict(samples_per_gpu=1)
