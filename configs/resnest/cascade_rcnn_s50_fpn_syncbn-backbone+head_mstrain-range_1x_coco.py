# Variant parity: reference configs/resnest/cascade_rcnn_s50_fpn_syncbn-backbone+head_mstrain-range_1x_coco.py
_base_ = ['../cascade_rcnn/cascade_rcnn_r50_fpn_1x_coco.py']
model = dict(
    backbone=dict(_delete_=True, type='ResNeSt', depth=50,
                  radix=2, groups=1, base_width=4,
                  out_indices=(0, 1, 2, 3)))
