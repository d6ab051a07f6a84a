# Variant parity: reference configs/fcos/fcos_center-normbbox-centeronreg-giou_r50_caffe_fpn_gn-head_1x_coco.py
_base_ = ['fcos_r50_caffe_fpn_gn-head_1x_coco.py']
model = dict(bbox_head=dict(loss_bbox=dict(type='GIoULoss', loss_weight=1.0)))
