# Variant parity: reference configs/fpg/retinanet_r50_fpg_crop640_50e_coco.py
_base_ = ['../retinanet/retinanet_r50_fpn_1x_coco.py']
model = dict(neck=dict(_delete_=True, type='FPG',
                       in_channels=[256, 512, 1024, 2048],
                       out_channels=256, num_outs=5, stack_times=9))
img_norm_cfg = dict(mean=[123.675, 116.28, 103.53],
                    std=[58.395, 57.12, 57.375], to_rgb=True)
train_pipeline = [
    dict(type='LoadImageFromFile'),
    dict(type='LoadAnnotations', with_bbox=True),
    dict(type='Resize', img_scale=(640, 640), keep_ratio=True),
    dict(type='RandomFlip', flip_ratio=0.5),
    dict(type='Normalize', **img_norm_cfg),
    dict(type='Pad', size=(640, 640)),
]
data = dict(train=dict(pipeline=train_pipeline))
lr_config = dict(step=[40, 46])
runner = dict(max_epochs=50)
