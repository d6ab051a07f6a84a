# Variant parity: reference configs/yolo/yolov3_mobilenetv2_mstrain-416_300e_coco.py
_base_ = ['yolov3_d53_mstrain-608_273e_coco.py']
model = dict(
    backbone=dict(_delete_=True, type='MobileNetV2',
                  out_indices=(2, 4, 6)),
    neck=dict(in_channels=[32, 96, 320], out_channels=[96, 96, 96]),
    bbox_head=dict(in_channels=[96, 96, 96]))
canvas_hw = (416, 416)
runner = dict(max_epochs=300)
