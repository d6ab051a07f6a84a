# Supervised FCOS baseline on a partially-labeled COCO split
# (parity target: configs/fcos_semi/r50_caffe_mslonger_tricks_0.Xdata.py in
# the reference — 100-epoch supervised training on x% labeled data).
_base_ = [
    '../_base_/models/fcos_r50_fpn.py',
    '../_base_/default_runtime.py',
]

img_norm_cfg = dict(
    mean=[103.530, 116.280, 123.675], std=[1.0, 1.0, 1.0], to_rgb=False)
train_pipeline = [
    dict(type='LoadImageFromFile'),
    dict(type='LoadAnnotations', with_bbox=True),
    dict(type='Resize', img_scale=[(1333, 640), (1333, 800)],
         multiscale_mode='value', keep_ratio=True),
    dict(type='RandomFlip', flip_ratio=0.5),
    dict(type='Normalize', **img_norm_cfg),
    dict(type='Pad', size_divisor=32),
]
test_pipeline = [
    dict(type='LoadImageFromFile'),
    dict(type='MultiScaleFlipAug', img_scale=(1333, 800), flip=False,
         transforms=[
             dict(type='Resize', keep_ratio=True),
             dict(type='RandomFlip'),
             dict(type='Normalize', **img_norm_cfg),
             dict(type='Pad', size_divisor=32),
         ]),
]

data_root = 'data/semicoco/'
canvas_hw = (800, 1344)
data = dict(
    samples_per_gpu=2,
    workers_per_gpu=2,
    train=dict(
        type='SemiCOCODataset',
        ann_file='data_list/coco_semi/semi_supervised/instances_train2017.2@10.json',
        ann_path=data_root + 'prepared_annos/Industry/annotations/full/',
        labelmapper=data_root + 'mmdet_category_info.json',
        img_prefix=data_root + 'images/full/',
        pipeline=train_pipeline),
    val=dict(
        type='CocoDataset',
        ann_file='data_list/coco_semi/semi_supervised/instances_val2017.json',
        img_prefix=data_root + 'valid_images/full/',
        pipeline=test_pipeline),
    test=dict(
        type='CocoDataset',
        ann_file='data_list/coco_semi/semi_supervised/instances_val2017.json',
        img_prefix=data_root + 'valid_images/full/',
        pipeline=test_pipeline))

optimizer = dict(type='SGD', lr=0.01, momentum=0.9, weight_decay=0.0001,
                 paramwise_cfg=dict(bias_lr_mult=2., bias_decay_mult=0.))
optimizer_config = dict(grad_clip=dict(max_norm=35, norm_type=2))
lr_config = dict(policy='step', warmup='linear', warmup_iters=500,
                 warmup_ratio=1.0 / 3, step=[65, 85])
runner = dict(type='SemiEpochBasedRunner', max_epochs=100)
evaluation = dict(interval=5, metric='bbox')
