# Variant parity: reference configs/mask_rcnn/mask_rcnn_r50_caffe_fpn_poly_1x_coco_v1.py
_base_ = ['mask_rcnn_r50_fpn_1x_coco.py']
model = dict(backbone=dict(style='caffe'))
img_norm_cfg = dict(mean=[103.530, 116.280, 123.675],
                    std=[1.0, 1.0, 1.0], to_rgb=False)
# legacy v1 protocol: smooth-L1 RPN (beta 1/9), poly masks
model = dict(rpn_head=dict(loss_bbox=dict(type='SmoothL1Loss',
                                          beta=1.0 / 9.0, loss_weight=1.0)))
train_pipeline = [
    dict(type='LoadImageFromFile'),
    dict(type='LoadAnnotations', with_bbox=True, with_mask=True,
         poly2mask=False),
    dict(type='Resize', img_scale=(1333, 800), keep_ratio=True),
    dict(type='RandomFlip', flip_ratio=0.5),
    dict(type='Normalize', **img_norm_cfg),
    dict(type='Pad', size_divisor=32),
]
data = dict(train=dict(pipeline=train_pipeline))
