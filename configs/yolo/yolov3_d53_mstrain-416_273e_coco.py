# Variant parity: reference configs/yolo/yolov3_d53_mstrain-416_273e_coco.py
_base_ = ['yolov3_d53_mstrain-608_273e_coco.py']
canvas_hw = (416, 416)
