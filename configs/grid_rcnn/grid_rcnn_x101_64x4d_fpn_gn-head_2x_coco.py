# Variant parity: reference configs/grid_rcnn/grid_rcnn_x101_64x4d_fpn_gn-head_2x_coco.py
_base_ = ['grid_rcnn_r50_fpn_gn-head_2x_coco.py']
model = dict(backbone=dict(type='ResNeXt', depth=101, groups=64,
                           base_width=4))
