# Variant parity: reference configs/sabl/sabl_retinanet_r101_fpn_gn_1x_coco.py
_base_ = ['sabl_retinanet_r50_fpn_gn_1x_coco.py']
model = dict(backbone=dict(depth=101))
