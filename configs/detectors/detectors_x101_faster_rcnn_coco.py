# DetectoRS with ResNeXt-101 (reference configs/detectors + detectors_resnext.py)
_base_ = ['./detectors_faster_rcnn_r50_coco.py']
model = dict(backbone=dict(type='DetectoRSResNeXt', depth=101,
                           groups=32, base_width=4))
