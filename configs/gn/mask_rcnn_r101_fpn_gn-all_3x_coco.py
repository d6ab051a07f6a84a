# Variant parity: reference configs/gn/mask_rcnn_r101_fpn_gn-all_3x_coco.py
_base_ = ['../mask_rcnn/mask_rcnn_r50_fpn_1x_coco.py']
norm_cfg = dict(type='GN', num_groups=32)
model = dict(backbone=dict(depth=101, norm_cfg=norm_cfg), neck=dict(norm_cfg=norm_cfg))
lr_config = dict(step=[27, 33])
runner = dict(max_epochs=36)
