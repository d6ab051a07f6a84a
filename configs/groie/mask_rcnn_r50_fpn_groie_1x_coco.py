# Variant parity: reference configs/groie/mask_rcnn_r50_fpn_groie_1x_coco.py
# (GRoIE on the bbox branch; mask pooling keeps level assignment)
_base_ = ['../mask_rcnn/mask_rcnn_r50_fpn_1x_coco.py']
model = dict(bbox_head=dict(roi_extractor='sum'))
