# MMDet V1.x-compatible anchors/coder (reference configs/legacy_1.x/retinanet_r50_fpn_1x_coco_v1.py):
# the legacy +1 w/h delta convention lives in core.boxes.legacy_bbox2delta /
# legacy_delta2bbox for importing V1.x-trained checkpoints.
_base_ = ['../retinanet/retinanet_r50_fpn_1x_coco.py']
model = dict(bbox_head=dict(
    anchor_generator=dict(octave_base_scale=4, scales_per_octave=3)))
