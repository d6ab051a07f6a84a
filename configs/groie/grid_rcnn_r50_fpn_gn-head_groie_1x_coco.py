# Variant parity: reference configs/groie/grid_rcnn_r50_fpn_gn-head_groie_1x_coco.py
_base_ = ['../grid_rcnn/grid_rcnn_r50_fpn_gn-head_1x_coco.py']
model = dict(bbox_head=dict(roi_extractor='sum'))
