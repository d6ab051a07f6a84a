# GroupNorm backbone (reference configs/gn/mask_rcnn_r50_fpn_gn-all_2x_coco.py)
_base_ = ['../mask_rcnn/mask_rcnn_r50_fpn_coco.py']
model = dict(backbone=dict(norm_cfg=dict(type='GN', num_groups=32)))
