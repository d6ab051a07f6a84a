# Variant parity: reference configs/cascade_rcnn/cascade_rcnn_x101_32x4d_fpn_20e_coco.py
_base_ = ['cascade_rcnn_x101_32x4d_fpn_1x_coco.py']
lr_config = dict(step=[16, 19])
runner = dict(max_epochs=20)
