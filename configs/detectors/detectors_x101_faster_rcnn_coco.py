# DetectoRS with ResNeXt-101 (reference configs/detectors + detectors_resnext.py);
# the RFP recursive backbone must match the main backbone
_base_ = ['./detectors_faster_rcnn_r50_coco.py']
model = dict(
    backbone=dict(type='DetectoRSResNeXt', depth=101,
                  groups=32, base_width=4),
    neck=dict(rfp_backbone=dict(type='DetectoRSResNeXt', depth=101,
                                groups=32, base_width=4)))
