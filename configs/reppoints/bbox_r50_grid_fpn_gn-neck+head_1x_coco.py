# Variant parity: reference configs/reppoints/bbox_r50_grid_fpn_gn-neck+head_1x_coco.py
_base_ = ['reppoints_moment_r50_fpn_gn-neck+head_1x_coco.py']
# 'bbox' init transform: points from a box grid (reference
# configs/reppoints README: partial grid supervision)
model = dict(bbox_head=dict(transform_method='minmax',
                            use_grid_points=True))
