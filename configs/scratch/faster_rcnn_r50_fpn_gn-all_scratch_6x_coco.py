# Training from scratch: no frozen stages, GN norms (reference
# configs/scratch/faster_rcnn_r50_fpn_gn-all_scratch_6x_coco.py)
_base_ = ['../faster_rcnn/faster_rcnn_r50_fpn_1x_coco.py']
model = dict(backbone=dict(frozen_stages=-1, norm_eval=False,
                           zero_init_residual=False,
                           norm_cfg=dict(type='GN', num_groups=32)))
