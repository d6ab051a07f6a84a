# Variant parity: reference configs/scratch/mask_rcnn_r50_fpn_gn-all_scratch_6x_coco.py
_base_ = ['../mask_rcnn/mask_rcnn_r50_fpn_1x_coco.py']
model = dict(backbone=dict(frozen_stages=-1, norm_eval=False,
                           zero_init_residual=False,
                           norm_cfg=dict(type='GN', num_groups=32)))
lr_config = dict(step=[65, 71])
runner = dict(max_epochs=73)
