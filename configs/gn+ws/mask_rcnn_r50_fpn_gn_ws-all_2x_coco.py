# (reference configs/gn+ws/mask_rcnn_r50_fpn_gn_ws-all_2x_coco.py)
_base_ = ['../mask_rcnn/mask_rcnn_r50_fpn_1x_coco.py']
conv_cfg = dict(type='ConvWS')
norm_cfg = dict(type='GN', num_groups=32)
model = dict(
    backbone=dict(conv_cfg=conv_cfg, norm_cfg=norm_cfg),
    neck=dict(conv_cfg=conv_cfg, norm_cfg=norm_cfg))
lr_config = dict(step=[16, 22])
total_epochs = 24
