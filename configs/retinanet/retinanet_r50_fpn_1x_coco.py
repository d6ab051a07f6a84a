_base_ = ['../_base_/default_runtime.py',
          '../_base_/schedules/schedule_semi.py']
model = dict(
    type='RetinaNet',
    backbone=dict(type='ResNet', depth=50, out_indices=(0, 1, 2, 3),
                  frozen_stages=1, style='pytorch'),
    neck=dict(type='FPN', in_channels=[256, 512, 1024, 2048],
              out_channels=256, start_level=1, add_extra_convs='on_input',
              num_outs=5),
    bbox_head=dict(type='RetinaHead', num_classes=80, in_channels=256,
                   feat_channels=256, stacked_convs=4,
                   strides=[8, 16, 32, 64, 128]),
    test_cfg=dict(nms_pre=1000, score_thr=0.05,
                  nms=dict(type='nms', iou_threshold=0.5), max_per_img=100))
img_norm_cfg = dict(mean=[123.675, 116.28, 103.53],
                    std=[58.395, 57.12, 57.375], to_rgb=True)
train_pipeline = [
    dict(type='LoadImageFromFile'),
    dict(type='LoadAnnotations', with_bbox=True),
    dict(type='Resize', img_scale=(1333, 800), keep_ratio=True),
    dict(type='RandomFlip', flip_ratio=0.5),
    dict(type='Normalize', **img_norm_cfg),
    dict(type='Pad', size_divisor=32),
]
test_pipeline = [
    dict(type='LoadImageFromFile'),
    dict(type='MultiScaleFlipAug', img_scale=(1333, 800), flip=False,
         transforms=[dict(type='Resize', keep_ratio=True),
                     dict(type='Normalize', **img_norm_cfg),
                     dict(type='Pad', size_divisor=32)]),
]
data_root = 'data/coco/'
canvas_hw = (800, 1344)
data = dict(
    samples_per_gpu=2, workers_per_gpu=2,
    train=dict(type='CocoDataset',
               ann_file=data_root + 'annotations/instances_train2017.json',
               img_prefix=data_root + 'train2017/', pipeline=train_pipeline),
    val=dict(type='CocoDataset',
             ann_file=data_root + 'annotations/instances_val2017.json',
             img_prefix=data_root + 'val2017/', pipeline=test_pipeline),
    test=dict(type='CocoDataset',
              ann_file=data_root + 'annotations/instances_val2017.json',
              img_prefix=data_root + 'val2017/', pipeline=test_pipeline))
lr_config = dict(policy='step', warmup='linear', warmup_iters=500,
                 warmup_ratio=1.0 / 3, step=[8, 11])
runner = dict(type='SemiEpochBasedRunner', max_epochs=12)
evaluation = dict(interval=1, metric='bbox')
