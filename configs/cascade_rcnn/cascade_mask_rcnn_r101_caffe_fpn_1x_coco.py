# Variant parity: reference configs/cascade_rcnn/cascade_mask_rcnn_r101_caffe_fpn_1x_coco.py
_base_ = ['cascade_mask_rcnn_r50_fpn_1x_coco.py']
model = dict(backbone=dict(depth=101, style='caffe'))
img_norm_cfg = dict(mean=[103.530, 116.280, 123.675],
                    std=[1.0, 1.0, 1.0], to_rgb=False)
