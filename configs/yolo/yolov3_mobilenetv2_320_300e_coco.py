# Variant parity: reference configs/yolo/yolov3_mobilenetv2_320_300e_coco.py
_base_ = ['yolov3_mobilenetv2_mstrain-416_300e_coco.py']
canvas_hw = (320, 320)
