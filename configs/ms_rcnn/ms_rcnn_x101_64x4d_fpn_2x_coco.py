# Variant parity: reference configs/ms_rcnn/ms_rcnn_x101_64x4d_fpn_2x_coco.py
_base_ = ['ms_rcnn_r50_fpn_1x_coco.py']
model = dict(backbone=dict(type='ResNeXt', depth=101, groups=64,
                           base_width=4))
lr_config = dict(step=[16, 22])
runner = dict(max_epochs=24)
