# RegNetX-3.2GF Faster R-CNN mstrain 3x (reference configs/regnet/faster_rcnn_regnetx-3.2GF_fpn_mstrain_3x_coco.py)
_base_ = ['../faster_rcnn/faster_rcnn_r50_fpn_1x_coco.py']
model = dict(
    backbone=dict(_delete_=True, type='RegNet', arch='regnetx_3.2gf',
                  out_indices=(0, 1, 2, 3)),
    neck=dict(_delete_=True, type='FPN', in_channels=[96, 192, 432, 1008], out_channels=256,
              start_level=0, num_outs=5))
optimizer = dict(weight_decay=0.00005)
img_norm_cfg = dict(mean=[103.53, 116.28, 123.675],
                    std=[57.375, 57.12, 58.395], to_rgb=False)
train_pipeline = [
    dict(type='LoadImageFromFile'),
    dict(type='LoadAnnotations', with_bbox=True),
    dict(type='Resize', img_scale=[(1333, 640), (1333, 800)],
         multiscale_mode='range', keep_ratio=True),
    dict(type='RandomFlip', flip_ratio=0.5),
    dict(type='Normalize', **img_norm_cfg),
    dict(type='Pad', size_divisor=32),
]
data = dict(train=dict(pipeline=train_pipeline))
lr_config = dict(step=[28, 34])
runner = dict(max_epochs=36)
