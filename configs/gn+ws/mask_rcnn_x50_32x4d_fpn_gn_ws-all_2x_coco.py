# Variant parity: reference configs/gn+ws/mask_rcnn_x50_32x4d_fpn_gn_ws-all_2x_coco.py
_base_ = ['mask_rcnn_r50_fpn_gn_ws-all_2x_coco.py']
model = dict(backbone=dict(type='ResNeXt', depth=50, groups=32,
                           base_width=4))
