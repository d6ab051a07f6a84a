# LVIS v0.5 instance-seg data, class-balanced oversampling (reference
# configs/_base_/datasets/lvis_v0.5_instance.py).
_base_ = 'coco_instance.py'
dataset_type = 'LVISV05Dataset'
data_root = 'data/lvis_v0.5/'
train_pipeline = [
    dict(type='LoadImageFromFile'),
    dict(type='LoadAnnotations', with_bbox=True, with_mask=True),
    dict(type='Resize',
         img_scale=[(1333, 640), (1333, 672), (1333, 704), (1333, 736),
                    (1333, 768), (1333, 800)],
         multiscale_mode='value', keep_ratio=True),
    dict(type='RandomFlip', flip_ratio=0.5),
    dict(type='Normalize', mean=[123.675, 116.28, 103.53],
         std=[58.395, 57.12, 57.375], to_rgb=True),
    dict(type='Pad', size_divisor=32),
]
data = dict(
    samples_per_gpu=2, workers_per_gpu=2,
    train=dict(
        _delete_=True,
        type='ClassBalancedDataset', oversample_thr=1e-3,
        dataset=dict(type=dataset_type,
                     ann_file=data_root + 'annotations/lvis_v0.5_train.json',
                     img_prefix=data_root + 'train2017/',
                     pipeline=train_pipeline)),
    val=dict(type=dataset_type,
             ann_file=data_root + 'annotations/lvis_v0.5_val.json',
             img_prefix=data_root + 'val2017/'),
    test=dict(type=dataset_type,
              ann_file=data_root + 'annotations/lvis_v0.5_val.json',
              img_prefix=data_root + 'val2017/'))
evaluation = dict(metric=['bbox', 'segm'])
