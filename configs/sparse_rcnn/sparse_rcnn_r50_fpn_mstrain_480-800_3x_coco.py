# Variant parity: reference configs/sparse_rcnn/sparse_rcnn_r50_fpn_mstrain_480-800_3x_coco.py
_base_ = ['sparse_rcnn_r50_fpn_1x_coco.py']
img_norm_cfg = dict(mean=[123.675, 116.28, 103.53],
                    std=[58.395, 57.12, 57.375], to_rgb=True)
train_pipeline = [
    dict(type='LoadImageFromFile'),
    dict(type='LoadAnnotations', with_bbox=True),
    dict(type='Resize',
         img_scale=[(1333, v) for v in (480, 512, 544, 576, 608, 640,
                                        672, 704, 736, 768, 800)],
         multiscale_mode='value', keep_ratio=True),
    dict(type='RandomFlip', flip_ratio=0.5),
    dict(type='Normalize', **img_norm_cfg),
    dict(type='Pad', size_divisor=32),
]
data = dict(train=dict(pipeline=train_pipeline))
lr_config = dict(step=[27, 33])
runner = dict(max_epochs=36)
