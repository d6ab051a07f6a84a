# Variant parity: reference configs/gn/mask_rcnn_r50_fpn_gn-all_contrib_3x_coco.py
# (contrib GN-pretrained backbone weights; same graph as gn-all)
_base_ = ['../mask_rcnn/mask_rcnn_r50_fpn_1x_coco.py']
norm_cfg = dict(type='GN', num_groups=32)
model = dict(backbone=dict(norm_cfg=norm_cfg),
             neck=dict(norm_cfg=norm_cfg))
lr_config = dict(step=[28, 34])
runner = dict(max_epochs=36)
