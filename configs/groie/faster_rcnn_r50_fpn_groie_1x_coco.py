# GRoIE: generic all-level RoI extraction
# (reference configs/groie/faster_rcnn_r50_fpn_groie_1x_coco.py)
_base_ = ['../faster_rcnn/faster_rcnn_r50_fpn_1x_coco.py']
model = dict(bbox_head=dict(roi_extractor='sum'))
