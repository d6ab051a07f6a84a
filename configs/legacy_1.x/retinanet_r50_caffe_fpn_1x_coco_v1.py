# Reference configs/legacy_1.x/retinanet_r50_caffe_fpn_1x_coco_v1.py.
_base_ = ['./retinanet_r50_fpn_1x_coco_v1.py']
model = dict(backbone=dict(style='caffe'))
